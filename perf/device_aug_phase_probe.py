"""Attribute the production device-aug overhead (66ms on a 51ms step at
b128 224², BENCH_PORTFOLIO input_pipeline_stall) to its phases, and probe
warp alternatives' ceilings.

Slope timing: each phase is applied K times chained (distinct fold_in rng
per rep so nothing collapses), timed at two K values; the ~26-32ms relay
latency and the pipeline's fixed costs cancel in the difference.

Usage: python -u perf/device_aug_phase_probe.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SIMPLEAICV_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SIMPLEAICV_PLATFORM"])
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 224


def slope_time(name, fn, img, reps=(2, 6), outer=3):
    """fn(img, rng) -> img-like; time K-chained applications at two K."""

    def chain(x, k):
        for i in range(k):
            x = fn(x, jax.random.fold_in(jax.random.PRNGKey(7), i))
        return jnp.sum(x[:, ::37, ::37].astype(jnp.float32))

    times = {}
    for k in reps:
        f = jax.jit(lambda x: chain(x, k))
        float(f(img))                                   # compile + sync
        t0 = time.perf_counter()
        for _ in range(outer):
            out = f(img)
        float(out)
        times[k] = (time.perf_counter() - t0) / outer
    k0, k1 = reps
    per = (times[k1] - times[k0]) / (k1 - k0)
    print(f"{name:28s} {per * 1000:8.2f} ms/batch", flush=True)
    return per


def main():
    from simpleaicv_tpu.data import device_augment as da

    rng_np = np.random.RandomState(0)
    img = jnp.asarray(
        rng_np.randint(0, 256, (B, H, W, 3)).astype(np.float32))

    aug = da.DeviceAutoAugment("original")
    erasing = da.DeviceRandomErasing(prob=0.25)
    pipe = da.DeviceAugmentPipeline(augment=aug, erasing=erasing)
    labels = jnp.asarray(rng_np.randint(0, 1000, (B,)), jnp.int32)

    def full(x, r):
        return pipe({"image": x, "label": labels}, r)["image"] * 255.0

    slope_time("full_pipeline", full, img)
    slope_time("autoaugment_only", lambda x, r: aug(x, r), img)

    # the warp alone, rotate-like matrices (the worst-case geometric op)
    ang = jnp.asarray(rng_np.uniform(-0.5, 0.5, (B,)), jnp.float32)

    def warp_only(x, r):
        del r
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        cx, cy = W / 2.0, H / 2.0
        mats = jnp.stack([cos, sin, cx - cos * cx - sin * cy,
                          -sin, cos, cy + sin * cx - cos * cy], axis=-1)
        return da._affine_warp(x, mats)

    slope_time("affine_warp_only", warp_only, img)

    def point_ops(x, r):
        arg = jax.random.uniform(r, (B,))
        kind = jax.random.randint(jax.random.fold_in(r, 1), (B,), 0, 8)
        return da._apply_point_ops(x, kind.astype(jnp.float32), arg, True,
                                   True)

    slope_time("point_ops(all+eq+ac)", point_ops, img)

    def blends(x, r):
        arg = jax.random.uniform(r, (B,)) * 1.8
        kind = jax.random.randint(jax.random.fold_in(r, 1), (B,), 8, 12)
        degs = da._blend_degenerates(x, True, True, True)
        return da._apply_blend(x, kind.astype(jnp.float32), arg, degs)

    slope_time("blends(+degenerates)", blends, img)
    slope_time("erasing_only", lambda x, r: erasing(x, r) , img)
    slope_time("normalize_only", lambda x, r: x / 255.0 * 255.0, img)
    slope_time("quantize_only", lambda x, r: da._quantize(x), img)

    def mixup(x, r):
        mc = da.DeviceMixupCutmix(num_classes=1000)
        out, _ = mc(x, labels, r)
        return out

    slope_time("mixupcutmix_only", mixup, img)

    # ---- warp-alternative ceilings (timing patterns, see docstring) ----
    # exact banded-rows one-hot vertical pass + full-width horizontal pass;
    # exact for the shear/translate families (one pass is identity there),
    # +-1-row approximate for rotate (see ROADMAP round-5). Times the MXU
    # cost the pattern would pay.
    BAND = 256

    def warp_onehot_2pass(x, r):
        del r
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        cx, cy = W / 2.0, H / 2.0
        mats = jnp.stack([cos, sin, cx - cos * cx - sin * cy,
                          -sin, cos, cy + sin * cx - cos * cy], axis=-1)
        a, bb, cc, d, e, f = [mats[:, i] for i in range(6)]
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        sx = a[:, None, None] * xs + bb[:, None, None] * ys + cc[:, None, None]
        sy = d[:, None, None] * xs + e[:, None, None] * ys + f[:, None, None]
        sxi = jnp.round(sx).astype(jnp.int32)
        syi = jnp.round(sy).astype(jnp.int32)
        # vertical: banded one-hot over source rows centred at output row
        offs = jnp.arange(BAND, dtype=jnp.int32) - BAND // 2
        rows = jnp.arange(H, dtype=jnp.int32)[:, None] + offs[None, :]
        ohv = (syi[..., None] == rows[None, :, None, :]).astype(jnp.bfloat16)
        rc = jnp.clip(rows, 0, H - 1)
        imgb = x.astype(jnp.bfloat16)[:, rc]             # [B,H,BAND,W,C]
        t = jnp.einsum("byxj,byjxc->byxc", ohv, imgb,
                       preferred_element_type=jnp.float32)
        # horizontal: full-width one-hot
        cols = jnp.arange(W, dtype=jnp.int32)
        ohh = (sxi[..., None] == cols).astype(jnp.bfloat16)
        out = jnp.einsum("byxw,bywc->byxc", ohh, t.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    slope_time("warp_onehot_2pass_ceiling", warp_onehot_2pass, img)


if __name__ == "__main__":
    main()
