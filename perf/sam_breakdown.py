"""Localise the SAM-B 1024^2 step cost (portfolio showed 777ms/step, 2% MFU).

Times, separately (slope-style, single host fetch per measurement):
  enc_fwd      image encoder forward only
  enc_train    encoder fwd+bwd (sum-of-squares loss)
  full_fwd     full SAM forward (prompts + decoder)
  full_step    full train step with SAMMultiLevelLoss (the bench number)

Run: python perf/sam_breakdown.py [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(fn, n=6):
    fn()  # compile
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    from simpleaicv_tpu.models.interactive_segmentation.sam import sam_b

    image = 1024
    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.randn(1, image, image, 3), jnp.bfloat16)
    model = sam_b(image_size=image)

    # ---- encoder only (sam_b geometry)
    from simpleaicv_tpu.models.interactive_segmentation.image_encoder import (
        ViTImageEncoder)
    enc = ViTImageEncoder(image_size=image, embedding_planes=768,
                          block_nums=12, head_nums=12, window_size=14,
                          global_attn_indexes=(2, 5, 8, 11))
    ev = jax.jit(lambda r, xx: enc.init({"params": r}, xx, False))(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def enc_fwd(v, xx):
        return jnp.sum(enc.apply(v, xx, False).astype(jnp.float32))

    print("enc_fwd_ms", round(timed(lambda: float(enc_fwd(ev, x))) * 1000, 1),
          flush=True)

    @jax.jit
    def enc_train(v, xx):
        def loss(p):
            return jnp.sum(enc.apply(p, xx, False).astype(jnp.float32) ** 2)
        g = jax.grad(loss)(v)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

    print("enc_train_ms",
          round(timed(lambda: float(enc_train(ev, x))) * 1000, 1), flush=True)

    # ---- full model
    pts = np.zeros((1, 1, 3), np.float32)
    pts[:, :, :2] = rng_np.rand(1, 1, 2) * image
    pts[:, :, 2] = 1.0
    prompts = {"prompt_point": jnp.asarray(pts), "prompt_box": None,
               "prompt_mask": None}
    fv = jax.jit(lambda r, xx: model.init({"params": r}, xx, prompts))(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def full_fwd(v, xx):
        masks, iou = model.apply(v, xx, prompts)
        return jnp.sum(masks.astype(jnp.float32))

    print("full_fwd_ms",
          round(timed(lambda: float(full_fwd(fv, x))) * 1000, 1), flush=True)

    from simpleaicv_tpu.core.registry import LOSSES
    from simpleaicv_tpu.tasks.interactive_segmentation import make_loss_fn
    crit = LOSSES.create("SAMMultiLevelLoss")
    loss_fn = make_loss_fn(model, crit)
    mask = jnp.asarray(rng_np.rand(1, image, image) > 0.5, jnp.float32)
    batch = {"image": x, "prompt_point": prompts["prompt_point"],
             "prompt_box": None, "prompt_mask": None, "mask": mask}

    @jax.jit
    def full_step(v, b):
        params = v["params"]
        sv = {k: vv for k, vv in v.items() if k != "params"}

        def loss(p):
            out = loss_fn(p, sv, b, jax.random.PRNGKey(0), True)
            return out[0] if isinstance(out, tuple) else out
        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(x) * 0 for x in jax.tree.leaves(g))

    try:
        print("full_step_ms",
              round(timed(lambda: float(full_step(fv, batch))) * 1000, 1),
              flush=True)
    except Exception as e:
        print("full_step failed:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
