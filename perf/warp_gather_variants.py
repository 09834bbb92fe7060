"""Gather-granularity levers for the production PIL-exact affine warp.

The warp is the device-aug pipeline's dominant pass (55.7ms of the 66ms
b128 overhead, perf/device_aug_phase_probe.py). The production gather
moves one 32-float (128B) channel-padded slice per output pixel
(6.4M slices/batch at b128 224²); at 55.7ms that is ~8 cycles/slice —
issue-rate/traffic bound, not HBM-BW bound. Levers probed here, all
PIL-bit-exact (pixel values are integers on the uint8 lattice, exact in
bf16 and u8):

- bf16 source, 32-elem slices (64B/pixel, half the gather traffic)
- u8 source, 32-elem slices (32B/pixel, quarter traffic)
- u8 source, packed RGBX u32, 8-elem u32 slices (32B/pixel, fewer lanes)
- pair-gather: one [2-row x 8-col x 4ch] u8 slice serves TWO output
  columns (sx steps by {0,1}/column for every AutoAugment kind since
  |a| <= 1, sy by {-1,0,1}), halving slice count; VPU where-selection
  picks the exact nearest pixel afterwards.

Usage: python -u perf/warp_gather_variants.py [batch]
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
_FILL = 128.0


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
    print(f"{name:36s} {per * 1000:8.2f} ms/batch", flush=True)
    return per


def _indices(mat, h, w):
    def fix(v):
        return jnp.floor(v * 65536.0 + 0.5).astype(jnp.int32)[:, None, None]

    a, bb, cc, d, e, f = [mat[:, i] for i in range(6)]
    x0 = fix(a * 0.5 + bb * 0.5 + cc)
    y0 = fix(d * 0.5 + e * 0.5 + f)
    dxc, dxr, dyc, dyr = fix(a), fix(bb), fix(d), fix(e)
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    sx = (x0 + ys * dxr + xs * dxc) >> 16
    sy = (y0 + ys * dyr + xs * dyc) >> 16
    return sx, sy


def warp_pad(img, mat, dtype, pad):
    """Production pattern at (dtype, channel-pad) variants."""
    bsz, h, w, c = img.shape
    sx, sy = _indices(mat, h, w)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    idx = jnp.clip(sy, 0, h - 1) * w + jnp.clip(sx, 0, w - 1)
    src = img.astype(dtype).reshape(bsz, h * w, c)
    src = jnp.pad(src, ((0, 0), (0, 0), (0, pad - c)))
    out = jnp.take_along_axis(src, idx.reshape(bsz, h * w, 1),
                              axis=1)[..., :c]
    out = out.reshape(bsz, h, w, c).astype(img.dtype)
    return jnp.where(valid[..., None], out, _FILL)


def warp_u32_packed(img, mat):
    """RGB packed into one u32 word/pixel, gathered as 8-elem u32 slices."""
    bsz, h, w, c = img.shape
    sx, sy = _indices(mat, h, w)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    idx = jnp.clip(sy, 0, h - 1) * w + jnp.clip(sx, 0, w - 1)
    u = img.astype(jnp.uint32)
    packed = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
    packed = packed.reshape(bsz, h * w, 1)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 7)))
    got = jnp.take_along_axis(packed, idx.reshape(bsz, h * w, 1),
                              axis=1)[..., 0].reshape(bsz, h, w)
    out = jnp.stack([got & 0xFF, (got >> 8) & 0xFF, (got >> 16) & 0xFF],
                    axis=-1).astype(img.dtype)
    return jnp.where(valid[..., None], out, _FILL)


def main():
    rng_np = np.random.RandomState(0)
    img = jnp.asarray(rng_np.randint(0, 256, (B, H, W, 3)).astype(np.float32))
    ang = jnp.asarray(rng_np.uniform(-0.5, 0.5, (B,)), jnp.float32)

    def mats():
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        cx, cy = W / 2.0, H / 2.0
        return jnp.stack([cos, sin, cx - cos * cx - sin * cy,
                          -sin, cos, cy + sin * cx - cos * cy], axis=-1)

    from simpleaicv_tpu.data import device_augment as da
    slope_time("production f32 pad32",
               lambda x: da._affine_warp(x, mats()), img)
    for name, dt, pad in [("bf16 pad32", jnp.bfloat16, 32),
                          ("bf16 pad16", jnp.bfloat16, 16),
                          ("u8 pad32", jnp.uint8, 32),
                          ("u8 pad64", jnp.uint8, 64),
                          ("f32 pad8", jnp.float32, 8)]:
        slope_time(f"warp {name}", lambda x, d=dt, p=pad:
                   warp_pad(x, mats(), d, p), img)
    slope_time("warp u32-packed pad8",
               lambda x: warp_u32_packed(x, mats()), img)

    # numerical check vs production (values are exact lattice integers)
    m = mats()
    ref = np.asarray(da._affine_warp(img[:4], m[:4]))
    for name, fn in [("bf16 pad32", lambda: warp_pad(img[:4], m[:4],
                                                     jnp.bfloat16, 32)),
                     ("u8 pad32", lambda: warp_pad(img[:4], m[:4],
                                                   jnp.uint8, 32)),
                     ("u32-packed", lambda: warp_u32_packed(img[:4],
                                                            m[:4]))]:
        got = np.asarray(fn())
        ok = np.array_equal(ref, got)
        print(f"exactness {name:14s}: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        assert ok


if __name__ == "__main__":
    main()
