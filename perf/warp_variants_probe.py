"""On-chip probe: nearest-affine warp gather formulations (b128 224x224x3).

The production _affine_warp (data/device_augment.py:181-215) take_along_axis
gather measured 62.7ms/batch (13GB/s effective).  Variants probed here:

  pad32_f32    — production layout (baseline)
  pad32_bf16   — same gather, bf16 storage (half the slice bytes)
  pad8_bf16    — 8-wide slices in bf16 (16B units)
  pad128_f32   — full-lane 128-wide slices
  rowgather    — two gathers: rows [B,H,W,(hit rows)] impossible generally;
                 here: gather whole source ROWS per output pixel row-index
                 (sy) then per-pixel column within the gathered row.  Each
                 gather moves W*C but indices are per-(y,x) so traffic is
                 W/32x the pad32 slice bytes — expected loser; measures the
                 row-major gather rate.
  onehot_shear — per-row integer shift (shear/translate exact form) as a
                 row-block-scanned one-hot einsum on the MXU.

Usage: python -u perf/warp_variants_probe.py [phase ...]
"""

import sys
import time

import os
import jax
if os.environ.get("SIMPLEAICV_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SIMPLEAICV_PLATFORM"])
import jax.numpy as jnp
import numpy as np

B, H, W, C = 128, 224, 224, 3


def _img():
    return jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (B, H, W, C)).astype(np.float32))


def _idx():
    """Rotation-like nearest source indices + valid mask."""
    rng = np.random.RandomState(1)
    ang = rng.uniform(-0.5, 0.5, (B, 1, 1))
    cos, sin = np.cos(ang), np.sin(ang)
    ys, xs = np.mgrid[0:H, 0:W]
    cx, cy = W / 2.0, H / 2.0
    sx = (cos * (xs - cx) + sin * (ys - cy) + cx).astype(np.int32)
    sy = (-sin * (xs - cx) + cos * (ys - cy) + cy).astype(np.int32)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    idx = np.clip(sy, 0, H - 1) * W + np.clip(sx, 0, W - 1)
    return (jnp.asarray(idx.reshape(B, H * W, 1)),
            jnp.asarray(valid.reshape(B, H, W, 1)))


def measure(name, fn, *args, reps=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    s = float(out.sum())
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"(check {s:.0f})")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(out.sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1000:.2f} ms/batch")


def main():
    phases = sys.argv[1:] or ["pad32_f32", "pad32_bf16", "pad8_bf16",
                              "pad128_f32", "onehot_shear"]
    img = _img()
    idx, valid = _idx()

    if "pad32_f32" in phases:
        def fn(x, i, v):
            flat = jnp.pad(x.reshape(B, H * W, C),
                           ((0, 0), (0, 0), (0, 32 - C)))
            out = jnp.take_along_axis(flat, i, axis=1)[..., :C]
            return jnp.where(v, out.reshape(B, H, W, C), 128.0)
        measure("pad32_f32", fn, img, idx, valid)

    if "pad32_bf16" in phases:
        def fn(x, i, v):
            flat = jnp.pad(x.astype(jnp.bfloat16).reshape(B, H * W, C),
                           ((0, 0), (0, 0), (0, 32 - C)))
            out = jnp.take_along_axis(flat, i, axis=1)[..., :C]
            return jnp.where(v, out.reshape(B, H, W, C).astype(jnp.float32),
                             128.0)
        measure("pad32_bf16", fn, img, idx, valid)

    if "pad8_bf16" in phases:
        def fn(x, i, v):
            flat = jnp.pad(x.astype(jnp.bfloat16).reshape(B, H * W, C),
                           ((0, 0), (0, 0), (0, 8 - C)))
            out = jnp.take_along_axis(flat, i, axis=1)[..., :C]
            return jnp.where(v, out.reshape(B, H, W, C).astype(jnp.float32),
                             128.0)
        measure("pad8_bf16", fn, img, idx, valid)

    if "pad128_f32" in phases:
        def fn(x, i, v):
            flat = jnp.pad(x.reshape(B, H * W, C),
                           ((0, 0), (0, 0), (0, 128 - C)))
            out = jnp.take_along_axis(flat, i, axis=1)[..., :C]
            return jnp.where(v, out.reshape(B, H, W, C), 128.0)
        measure("pad128_f32", fn, img, idx, valid)

    if "onehot_shear" in phases:
        # per-row shift (exact shear/translate form): out[y,x]=img[y,x+s(y)]
        shifts = jnp.asarray(
            np.random.RandomState(2).randint(-60, 60, (B, H)), jnp.int32)

        def fn(x, s):
            xb = x.astype(jnp.bfloat16)
            src = jnp.arange(W)[None, None, :] + s[:, :, None]  # [B,H,W]
            ok = (src >= 0) & (src < W)
            srcc = jnp.clip(src, 0, W - 1)

            def blk(carry, ys):
                p = jax.nn.one_hot(srcc[:, ys], W,
                                   dtype=jnp.bfloat16)      # [B,16,W,W]
                o = jnp.einsum("byxw,bywc->byxc", p, xb[:, ys])
                return carry, o
            ysb = jnp.arange(H).reshape(-1, 16)
            _, outs = jax.lax.scan(blk, 0, ysb)
            out = outs.transpose(1, 0, 2, 3, 4).reshape(B, H, W, C)
            return jnp.where(ok[..., None], out.astype(jnp.float32), 128.0)
        measure("onehot_shear", fn, img, shifts)


if __name__ == "__main__":
    main()
