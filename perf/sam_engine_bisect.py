"""Bisect the SAM-B engine train step (1751ms measured vs 209ms encoder
fwd+bwd): time value_and_grad with REAL grad consumption (no *0 — XLA
dead-code-eliminates a zero-multiplied backward, which is why
sam_breakdown's full_step read 210ms) for nested prefixes of the step:

  enc_loss     encoder output sum-of-squares          (bwd through encoder)
  dec_loss     + decoder, loss = sum(masks^2)         (bwd through decoder)
  crit_loss    + SAMMultiLevelLoss                    (bwd through criterion)
  engine_step  full make_train_step (optimizer, clip) (the 1751ms config)

Run: python perf/sam_engine_bisect.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(fn, n=4):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    from simpleaicv_tpu.models.interactive_segmentation.sam import sam_b
    from simpleaicv_tpu.core.registry import LOSSES
    from simpleaicv_tpu.tasks.interactive_segmentation import make_loss_fn

    image = 1024
    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.randn(1, image, image, 3), jnp.bfloat16)
    pts = np.zeros((1, 1, 3), np.float32)
    pts[:, :, :2] = rng_np.rand(1, 1, 2) * image
    pts[:, :, 2] = 1.0
    prompts = {"prompt_point": jnp.asarray(pts), "prompt_box": None,
               "prompt_mask": None}
    mask = jnp.asarray(rng_np.rand(1, image, image) > 0.5, jnp.float32)
    model = sam_b(image_size=image)
    fv = jax.jit(lambda r: model.init({"params": r}, x, prompts))(
        jax.random.PRNGKey(0))
    params, sv = fv["params"], {k: v for k, v in fv.items()
                                if k != "params"}
    out = {}

    def gsum(g):
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree.leaves(g)) * 1e-9

    # ---- encoder-only bwd
    @jax.jit
    def enc_loss(p):
        emb = model.bind({"params": p, **sv}).encode_image(x, False)
        return jnp.sum(emb.astype(jnp.float32) ** 2)

    @jax.jit
    def enc_step(p):
        return gsum(jax.grad(enc_loss)(p))

    out["enc_loss_ms"] = round(timed(lambda: float(enc_step(params)))
                               * 1000, 1)
    print(json.dumps(out), flush=True)

    # ---- + decoder
    @jax.jit
    def dec_step(p):
        def loss(pp):
            masks, ious = model.apply({"params": pp, **sv}, x, prompts)
            return jnp.sum(masks.astype(jnp.float32) ** 2) * 1e-6 + \
                jnp.sum(ious.astype(jnp.float32) ** 2)
        return gsum(jax.grad(loss)(p))

    out["dec_loss_ms"] = round(timed(lambda: float(dec_step(params)))
                               * 1000, 1)
    print(json.dumps(out), flush=True)

    # ---- + criterion
    crit = LOSSES.create("SAMMultiLevelLoss")
    loss_fn = make_loss_fn(model, crit)
    batch = {"image": x, "prompt_point": prompts["prompt_point"],
             "prompt_box": None, "prompt_mask": None, "mask": mask}

    @jax.jit
    def crit_step(p):
        def loss(pp):
            out = loss_fn(pp, sv, batch, jax.random.PRNGKey(0), True)
            return out[0] if isinstance(out, tuple) else out
        return gsum(jax.grad(loss)(p))

    out["crit_loss_ms"] = round(timed(lambda: float(crit_step(params)))
                                * 1000, 1)
    print(json.dumps(out), flush=True)

    # ---- full engine step
    from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                            make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.01, momentum=0.9,
                        weight_decay=1e-4),
        SchedulerConfig(scheduler="CosineLR", lr=0.01, epochs=100),
        1000, params)
    cfg = EngineConfig()
    state = create_train_state(params, sv, tx, cfg)
    step = make_train_step(loss_fn, tx, cfg)
    rng = jax.random.PRNGKey(0)
    st, m = step(state, batch, rng)
    float(m["loss"])
    holder = {"s": st}

    def one():
        holder["s"], mm = step(holder["s"], batch, rng)
        float(mm["loss"])

    out["engine_step_ms"] = round(timed(one) * 1000, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
