"""On-chip cost anatomy of the device-side AutoAugment pipeline.

Usage: python -u device_aug_probe.py <phase> [batch]
Phases: warp_slice3 warp_chanfused warp_perchan warp_pad8 warp_onehot
        lut hist blends full

Per-call timing (the ops of interest are >>26ms relay latency when slow;
fast results are re-measured with an 8x inner chain)."""

import sys
import time

import jax

import os
if os.environ.get("SIMPLEAICV_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SIMPLEAICV_PLATFORM"])
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
H = W = 224
C = 3


def _img():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 256, (B, H, W, C)).astype(np.float32))


def _mat():
    rng = np.random.RandomState(1)
    ang = rng.uniform(-0.5, 0.5, (B,))
    cos, sin = np.cos(ang), np.sin(ang)
    cx, cy = W / 2.0, H / 2.0
    mat = np.stack([cos, sin, cx - cos * cx - sin * cy,
                    -sin, cos, cy + sin * cx - cos * cy], axis=-1)
    return jnp.asarray(mat, jnp.float32)


def measure(name, fn, img, reps=8):
    g = jax.jit(lambda x: jnp.sum(fn(x)[:, ::37, ::37]))
    t0 = time.perf_counter()
    float(g(img))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        v = g(img)
    float(v)
    per = (time.perf_counter() - t0) / reps
    gbytes = B * H * W * C * 4 * 2 / 1e9
    print(f"{name}: {per*1000:.2f} ms/batch  ({gbytes/per:.0f} GB/s eff)",
        flush=True)
    return per


def indices(mat):
    a, bb, cc, d, e, f = [mat[:, i] for i in range(6)]

    def fix(v):
        return jnp.floor(v * 65536.0 + 0.5).astype(jnp.int32)[:, None, None]

    x0 = fix(a * 0.5 + bb * 0.5 + cc)
    y0 = fix(d * 0.5 + e * 0.5 + f)
    dxc, dxr, dyc, dyr = fix(a), fix(bb), fix(d), fix(e)
    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    sx = (x0 + ys * dxr + xs * dxc) >> 16
    sy = (y0 + ys * dyr + xs * dyc) >> 16
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    idx = jnp.clip(sy, 0, H - 1) * W + jnp.clip(sx, 0, W - 1)
    return idx, valid


def main():
    phase = sys.argv[1]
    img = _img()
    mat = _mat()

    if phase == "warp_slice3":
        def fn(x):
            idx, valid = indices(mat)
            flat = x.reshape(B, H * W, C)
            out = jnp.take_along_axis(flat, idx.reshape(B, H * W, 1), axis=1)
            return jnp.where(valid.reshape(B, H, W, 1),
                             out.reshape(B, H, W, C), 128.0)
        measure(phase, fn, img, reps=4)

    elif phase == "warp_chanfused":
        def fn(x):
            idx, valid = indices(mat)
            flat = x.reshape(B, H * W * C)
            fid = (idx.reshape(B, H * W, 1) * C
                   + jnp.arange(C, dtype=jnp.int32)).reshape(B, -1)
            out = jnp.take_along_axis(flat, fid, axis=1)
            return jnp.where(valid.reshape(B, H, W, 1),
                             out.reshape(B, H, W, C), 128.0)
        measure(phase, fn, img, reps=4)

    elif phase == "warp_perchan":
        def fn(x):
            idx, valid = indices(mat)
            flat = x.reshape(B, H * W, C)
            outs = [jnp.take_along_axis(flat[..., c], idx.reshape(B, -1),
                                        axis=1) for c in range(C)]
            out = jnp.stack(outs, axis=-1)
            return jnp.where(valid.reshape(B, H, W, 1),
                             out.reshape(B, H, W, C), 128.0)
        measure(phase, fn, img, reps=4)

    elif phase == "warp_pad8":
        def fn(x):
            idx, valid = indices(mat)
            flat = jnp.pad(x.reshape(B, H * W, C), ((0, 0), (0, 0), (0, 5)))
            out = jnp.take_along_axis(flat, idx.reshape(B, H * W, 1),
                                      axis=1)[..., :C]
            return jnp.where(valid.reshape(B, H, W, 1),
                             out.reshape(B, H, W, C), 128.0)
        measure(phase, fn, img, reps=4)

    elif phase == "warp_onehot":
        # two-pass one-hot matmul resample: vertical then horizontal.
        # Needs separable indices — exact only for scale/translate; here we
        # time the movement pattern with the rotate row index at x=0 (cost
        # model only; exactness handled by the caller for separable ops).
        def fn(x):
            idx, valid = indices(mat)
            sy = (idx // W)[:, :, 0]                       # [B, H] (x=0 col)
            sx = (idx % W)[:, 0, :]                        # [B, W]
            py = jax.nn.one_hot(sy, H, dtype=jnp.bfloat16)  # [B, H, H]
            px = jax.nn.one_hot(sx, W, dtype=jnp.bfloat16)  # [B, W, W]
            t = jnp.einsum("byh,bhwc->bywc", py, x.astype(jnp.bfloat16))
            out = jnp.einsum("bxw,bywc->byxc", px, t)
            return jnp.where(valid.reshape(B, H, W, 1),
                             out.astype(x.dtype).transpose(0, 1, 2, 3),
                             128.0)
        measure(phase, fn, img, reps=4)

    elif phase == "lut":
        sys.path.insert(0, "/root/repo")
        from simpleaicv_tpu.data.device_augment import _apply_point_ops
        kind = jnp.full((B,), 5, jnp.int32)      # equalize: the heavy path
        arg = jnp.full((B,), 128.0)
        measure("point_ops_equalize",
                lambda x: _apply_point_ops(x, kind, arg, True, True), img)

    elif phase == "hist":
        sys.path.insert(0, "/root/repo")
        from simpleaicv_tpu.data.device_augment import _equalize_lut
        measure("equalize_hist_lut",
                lambda x: _equalize_lut(x)[:, 0, 0][:, None, None, None] + x,
                img)

    elif phase == "blends":
        sys.path.insert(0, "/root/repo")
        from simpleaicv_tpu.data.device_augment import (_blend_degenerates,
                                                        _B_COLOR)
        measure("blends",
                lambda x: _blend_degenerates(x, True, True, True)[_B_COLOR],
                img)

    elif phase == "full":
        sys.path.insert(0, "/root/repo")
        from simpleaicv_tpu.data.device_augment import DeviceAutoAugment
        aug = DeviceAutoAugment("original")
        key = jax.random.PRNGKey(0)
        measure("autoaugment_full", lambda x: aug(x, key), img, reps=4)


if __name__ == "__main__":
    main()
