"""On-chip probe: block-gather affine warp (exact, MXU selection).

The production per-pixel warp gather measures 60.2 ms/batch at b128 224^2
(perf/warp_variants_probe.py pad32_f32) — index-bound: 6.4M indices/batch
at ~9.4ns each, invariant to slice dtype/padding.  This probe reformulates
the SAME exact nearest-affine warp with 64x fewer gather indices:

  * every op in the augmentation zoo has affine coefficients with
    |a|+|b| <= 1.37 and |d|+|e| <= 1.37 (rotate <=30deg, shear <=0.3,
    translate unit diag), so the source pixels of an 8x8 OUTPUT block live
    inside a 16x16 SOURCE window anchored at the block's (min sy, min sx);
  * gather ONE (16,16,C) window per block — [B, 28*28] = 100k indices —
    as (16,128)-shaped slices on a channel-padded [H, W*8] f32 view
    (16 sublanes x 128 lanes: one aligned vreg tile per slice row-group);
  * select each output pixel from its window with two one-hot einsums over
    the 16-row / 16-col local indices (the equalize nibble trick): integer
    pixel values and 0/1 one-hots are exact in bf16, f32 accumulation, so
    the result is bit-identical to the direct gather.

Phases:
  gather8   — block gather alone (BS=8, C pad 8)
  full8     — exact warp: gather + nibble selection + valid mask (BS=8)
  full8c4   — same, C padded to 4 (half the window bytes, (16,64) slices)
  full16    — BS=16 output blocks from 32x32 windows (4x fewer indices)
  check     — CPU/numpy exactness of full8 vs the direct formulation

Usage: python -u perf/warp_blockgather_probe.py [phase ...]
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
    return np.random.RandomState(0).randint(
        0, 256, (B, H, W, C)).astype(np.float32)


def _srcidx():
    """Rotation-like nearest source indices (sy, sx int32) + valid mask."""
    rng = np.random.RandomState(1)
    ang = rng.uniform(-0.5, 0.5, (B, 1, 1))
    cos, sin = np.cos(ang), np.sin(ang)
    ys, xs = np.mgrid[0:H, 0:W]
    cx, cy = W / 2.0, H / 2.0
    sx = (cos * (xs - cx) + sin * (ys - cy) + cx).astype(np.int32)
    sy = (-sin * (xs - cx) + cos * (ys - cy) + cy).astype(np.int32)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    return (np.clip(sy, 0, H - 1), np.clip(sx, 0, W - 1), valid)


def measure(name, fn, *args, reps=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    s = float(out.sum())
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"(check {s:.0f})", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(out.sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1000:.2f} ms/batch", flush=True)


def block_warp(img, sy, sx, valid, bs, cpad):
    """Exact block-gather warp.  img [B,H,W,C] f32; sy/sx int32 [B,H,W]."""
    ss = 2 * bs                                  # source window side
    nby, nbx = H // bs, W // bs
    nb = nby * nbx
    syb = sy.reshape(B, nby, bs, nbx, bs)
    sxb = sx.reshape(B, nby, bs, nbx, bs)
    sy0 = jnp.minimum(syb.min(axis=(2, 4)), H - ss)      # [B,nby,nbx]
    sx0 = jnp.minimum(sxb.min(axis=(2, 4)), W - ss)
    ly = (syb - sy0[:, :, None, :, None]).reshape(B, nby, bs, nbx, bs)
    lx = (sxb - sx0[:, :, None, :, None]).reshape(B, nby, bs, nbx, bs)
    # [B, nb, bs*bs] local indices, block-major
    ly = ly.transpose(0, 1, 3, 2, 4).reshape(B, nb, bs * bs)
    lx = lx.transpose(0, 1, 3, 2, 4).reshape(B, nb, bs * bs)

    imgp = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, cpad - C)))
    flat = imgp.reshape(B, H, W * cpad)
    starts = jnp.stack([sy0.reshape(B, nb),
                        sx0.reshape(B, nb) * cpad], axis=-1)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def g1(op, st):
        return jax.lax.gather(op, st, dn, slice_sizes=(ss, ss * cpad))

    blk = jax.vmap(g1)(flat, starts)             # [B, nb, ss, ss*cpad]
    blk = blk.reshape(B, nb, ss, ss, cpad)[..., :C].astype(jnp.bfloat16)

    n = jnp.arange(ss, dtype=jnp.int32)
    ohy = (ly[..., None] == n).astype(jnp.bfloat16)      # [B,nb,p,ss]
    ohx = (lx[..., None] == n).astype(jnp.bfloat16)
    r = jnp.einsum("bnpy,bnyxc->bnpxc", ohy, blk,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bnpx,bnpxc->bnpc", ohx, r.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, nby, nbx, bs, bs, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    return jnp.where(valid[..., None], out, 128.0)


def direct_warp(img, sy, sx, valid):
    idx = (sy * W + sx).reshape(B, H * W, 1)
    flat = jnp.pad(img.reshape(B, H * W, C), ((0, 0), (0, 0), (0, 29)))
    out = jnp.take_along_axis(flat, idx, axis=1)[..., :C]
    return jnp.where(valid[..., None], out.reshape(B, H, W, C), 128.0)


def main():
    phases = sys.argv[1:] or ["gather8", "full8", "full8c4", "full16"]
    img = _img()
    sy, sx, valid = _srcidx()
    jimg = jnp.asarray(img)
    jsy, jsx, jvalid = jnp.asarray(sy), jnp.asarray(sx), jnp.asarray(valid)

    if "check" in phases:
        a = np.asarray(block_warp(jimg, jsy, jsx, jvalid, 8, 8))
        b = np.asarray(direct_warp(jimg, jsy, jsx, jvalid))
        diff = np.abs(a - b).max()
        print(f"check: block vs direct max |diff| = {diff}", flush=True)
        assert diff == 0.0, "block warp is not exact"

    if "gather8" in phases:
        def fn(x, sy, sx):
            ss, cpad, bs = 16, 8, 8
            nby, nbx = H // bs, W // bs
            nb = nby * nbx
            sy0 = jnp.minimum(
                sy.reshape(B, nby, bs, nbx, bs).min(axis=(2, 4)), H - ss)
            sx0 = jnp.minimum(
                sx.reshape(B, nby, bs, nbx, bs).min(axis=(2, 4)), W - ss)
            imgp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad - C)))
            flat = imgp.reshape(B, H, W * cpad)
            starts = jnp.stack([sy0.reshape(B, nb),
                                sx0.reshape(B, nb) * cpad], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1))

            def g1(op, st):
                return jax.lax.gather(op, st, dn,
                                      slice_sizes=(ss, ss * cpad))
            blk = jax.vmap(g1)(flat, starts)
            return blk[:, ::7, ::5, ::31]
        measure("gather8", fn, jimg, jsy, jsx)

    if "full8" in phases:
        measure("full8",
                lambda x, a, b, v: block_warp(x, a, b, v, 8, 8),
                jimg, jsy, jsx, jvalid)

    if "full8c4" in phases:
        measure("full8c4",
                lambda x, a, b, v: block_warp(x, a, b, v, 8, 4),
                jimg, jsy, jsx, jvalid)

    if "full16" in phases:
        measure("full16",
                lambda x, a, b, v: block_warp(x, a, b, v, 16, 8),
                jimg, jsy, jsx, jvalid)


if __name__ == "__main__":
    main()
