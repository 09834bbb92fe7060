"""Chunked one-hot (matmul/VPU-reduce) 2-pass affine warp: pattern-cost
probe vs the production 55.7ms gather warp (b128 224²,
perf/device_aug_phase_probe.py round-5 attribution).

Pass V (banded, chunked over output-row blocks): per block, a one-hot over
a window of source rows contracts against contiguous row slices.
Pass H: full-width one-hot over source columns, chunked the same way.
This phase times the r=0 (single row candidate) pattern — the EXACT
variant needs ~5 row candidates (see ROADMAP round-5), scaling pass V's
cost ~5x and pass H's channel width 5x.

Usage: python -u perf/warp_onehot_probe.py [batch] [block]
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
BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H = W = 224
# at 224² a banded window saves <10% over the full row range — use full H
J = H


def slope_time(name, fn, img, reps=(1, 3), outer=3):
    def chain(x, k):
        for i in range(k):
            x = fn(x) * (1.0 + 1e-6 * i)
        return jnp.sum(x[:, ::37, ::37].astype(jnp.float32))

    times = {}
    for k in reps:
        f = jax.jit(lambda x: chain(x, k))
        float(f(img))
        t0 = time.perf_counter()
        for _ in range(outer):
            out = f(img)
        float(out)
        times[k] = (time.perf_counter() - t0) / outer
    k0, k1 = reps
    per = (times[k1] - times[k0]) / (k1 - k0)
    print(f"{name:34s} {per * 1000:8.2f} ms/batch", flush=True)
    return per


def main():
    rng_np = np.random.RandomState(0)
    img = jnp.asarray(rng_np.randint(0, 256, (B, H, W, 3)).astype(np.float32))
    ang = jnp.asarray(rng_np.uniform(-0.5, 0.5, (B,)), jnp.float32)

    def mats():
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        cx, cy = W / 2.0, H / 2.0
        return jnp.stack([cos, sin, cx - cos * cx - sin * cy,
                          -sin, cos, cy + sin * cx - cos * cy], axis=-1)

    def indices(x):
        m = mats()
        a, bb, cc, d, e, f = [m[:, i] for i in range(6)]

        def fix(v):
            return jnp.floor(v * 65536.0 + 0.5).astype(jnp.int32)[:, None,
                                                                  None]
        x0 = fix(a * 0.5 + bb * 0.5 + cc)
        y0 = fix(d * 0.5 + e * 0.5 + f)
        dxc, dxr, dyc, dyr = fix(a), fix(bb), fix(d), fix(e)
        ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        sx = (x0 + ys * dxr + xs * dxc) >> 16
        sy = (y0 + ys * dyr + xs * dyc) >> 16
        return sx, sy

    def onehot_2pass(x):
        sx, sy = indices(x)
        sxc = jnp.clip(sx, 0, W - 1)
        syc = jnp.clip(sy, 0, H - 1)
        valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        xb = x.astype(jnp.bfloat16)
        n_blocks = H // BLK

        def block(b0):
            y_lo = b0 * BLK
            syb = jax.lax.dynamic_slice_in_dim(syc, y_lo, BLK, axis=1)
            sxb = jax.lax.dynamic_slice_in_dim(sxc, y_lo, BLK, axis=1)
            jj = jnp.arange(J, dtype=jnp.int32)
            ohv = (syb[..., None] == jj).astype(jnp.bfloat16)  # [B,BLK,W,J]
            t = jnp.einsum("byxj,bjxc->byxc", ohv, xb,
                           preferred_element_type=jnp.float32)
            ww = jnp.arange(W, dtype=jnp.int32)
            ohh = (sxb[..., None] == ww).astype(jnp.bfloat16)  # [B,BLK,W,W]
            out = jnp.einsum("byxw,bywc->byxc", ohh,
                             t.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return out

        outs = [block(i) for i in range(n_blocks)]
        out = jnp.concatenate(outs, axis=1)
        return jnp.where(valid[..., None], out.astype(x.dtype), 128.0)

    slope_time(f"onehot_2pass blk{BLK} fullJ", onehot_2pass, img)

    # production gather warp for reference on the same matrices
    from simpleaicv_tpu.data import device_augment as da

    def gather(x):
        return da._affine_warp(x, mats())

    slope_time("gather_warp (production)", gather, img)


if __name__ == "__main__":
    main()
