"""Gather-free formulations of the device-aug heavy passes, probed on chip.

Usage: python -u device_aug_probe2.py <phase> [batch]
Phases:
  lut_gather      — current take_along_axis LUT apply (baseline, slow?)
  lut_matmul      — onehot(v) @ lut as an MXU einsum (compare fused)
  hist_scatter    — current vmapped .at[].add histogram
  hist_matmul     — ones @ onehot(v) reduction as einsum
  warp_pad32      — warp gather with channels padded to 32 (MSDA regime)
  warp_band       — banded vertical+horizontal one-hot matmul (cost model)
  sanity          — 4096^2 matmul (chip responsiveness + timing floor)

Each phase prints trace/compile/first/steady separately so slow-compile
vs slow-execute is unambiguous."""

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
NPIX = H * W


def _img():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 256, (B, H, W, C)).astype(np.float32))


def _lut():
    rng = np.random.RandomState(1)
    return jnp.asarray(rng.randint(0, 256, (B, C, 256)).astype(np.float32))


def _mat():
    rng = np.random.RandomState(1)
    ang = rng.uniform(-0.5, 0.5, (B,))
    cos, sin = np.cos(ang), np.sin(ang)
    cx, cy = W / 2.0, H / 2.0
    return jnp.asarray(np.stack(
        [cos, sin, cx - cos * cx - sin * cy,
         -sin, cos, cy + sin * cx - cos * cy], axis=-1), jnp.float32)


def measure(name, fn, args, reps=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = f.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(compiled(*args))
    t_first = time.perf_counter() - t0
    print(f"{name}: trace {t_trace:.2f}s compile {t_compile:.1f}s "
          f"first {t_first:.2f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    v = float(out)
    per = (time.perf_counter() - t0) / reps
    print(f"{name}: {per*1000:.2f} ms/batch (check {v:.1f})", flush=True)
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

    if phase == "sanity":
        x = jnp.ones((4096, 4096), jnp.bfloat16)
        measure("sanity_matmul", lambda x: jnp.sum((x @ x)[::997, ::997]),
                (x,))
        return

    img = _img()

    if phase == "lut_gather":
        lut = _lut()

        def fn(x, lut):
            idx = x.astype(jnp.int32)
            lut_t = jnp.moveaxis(lut, 1, -1).reshape(B, 256 * C)
            flat = (idx * C + jnp.arange(C, dtype=jnp.int32)).reshape(B, -1)
            out = jnp.take_along_axis(lut_t, flat, axis=1)
            return jnp.sum(out.reshape(B, H, W, C)[:, ::37, ::37])
        measure(phase, fn, (img, lut), reps=4)

    elif phase == "lut_matmul":
        lut = _lut()

        def fn(x, lut):
            v = x.reshape(B, NPIX, C).astype(jnp.int32)
            ramp = jnp.arange(256, dtype=jnp.int32)
            # [B, NPIX, C, 256] one-hot, contracted on the 256 axis against
            # lut [B, C, 256] — XLA should fuse the compare into the dot
            oh = (v[..., None] == ramp).astype(jnp.bfloat16)
            out = jnp.einsum("bpck,bck->bpc", oh,
                             lut.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return jnp.sum(out.reshape(B, H, W, C)[:, ::37, ::37])
        measure(phase, fn, (img, lut), reps=4)

    elif phase == "hist_scatter":
        def fn(x):
            v = jnp.moveaxis(x, -1, 1).reshape(B * C, -1).astype(jnp.int32)

            def one(ch):
                return jnp.zeros((256,), jnp.float32).at[ch].add(1.0)

            hist = jax.vmap(one)(v).reshape(B, C, 256)
            return jnp.sum(hist[:, :, ::17])
        measure(phase, fn, (img,), reps=4)

    elif phase == "hist_matmul":
        def fn(x):
            v = x.reshape(B, NPIX, C).astype(jnp.int32)
            ramp = jnp.arange(256, dtype=jnp.int32)
            oh = (v[..., None] == ramp).astype(jnp.bfloat16)
            hist = jnp.einsum("bpck->bck", oh,
                              preferred_element_type=jnp.float32)
            return jnp.sum(hist[:, :, ::17])
        measure(phase, fn, (img,), reps=4)

    elif phase == "hist_matmul2":
        def fn(x):
            v = x.reshape(B, NPIX * C).astype(jnp.int32)
            ramp = jnp.arange(256, dtype=jnp.int32)
            oh = (v[..., None] == ramp).astype(jnp.bfloat16)   # [B,P*C,256]
            ones = jnp.ones((B, 1, NPIX * C), jnp.bfloat16)
            hist = jax.lax.batch_matmul(
                ones, oh, preferred_element_type=jnp.float32)
            return jnp.sum(hist[:, 0, ::17])
        measure(phase, fn, (img,), reps=4)

    elif phase == "warp_pad32":
        mat = _mat()

        def fn(x):
            idx, valid = indices(mat)
            flat = jnp.pad(x.reshape(B, NPIX, C).astype(jnp.bfloat16),
                           ((0, 0), (0, 0), (0, 29)))
            out = jnp.take_along_axis(flat, idx.reshape(B, NPIX, 1),
                                      axis=1)[..., :C]
            out = jnp.where(valid.reshape(B, H, W, 1),
                            out.reshape(B, H, W, C).astype(x.dtype), 128.0)
            return jnp.sum(out[:, ::37, ::37])
        measure(phase, fn, (img,), reps=4)

    elif phase == "warp_band":
        mat = _mat()
        BAND = 256

        def fn(x):
            idx, valid = indices(mat)
            sy = idx // W                                    # [B,H,W]
            sx = idx % W
            # vertical: t[b,y,x] = img[b, sy(y,x), x] via banded one-hot
            # over source rows h in [y-64, y+192) (cost model: rotate<=30deg)
            offs = jnp.arange(BAND, dtype=jnp.int32) - BAND // 2
            base = jnp.arange(H, dtype=jnp.int32)[:, None]   # output y
            rows = base + offs[None, :]                      # [H, BAND]
            oh_v = (sy[..., None] == rows[None, :, None, :]).astype(
                jnp.bfloat16)                                # [B,H,W,BAND]
            # gather the banded source rows: imgb[b, y, j, x, c] =
            # img[b, clip(rows[y,j]), x, c] — contiguous row slices, cheap
            rc = jnp.clip(rows, 0, H - 1)                    # [H,BAND]
            imgb = x.astype(jnp.bfloat16)[:, rc]             # [B,H,BAND,W,C]
            t = jnp.einsum("byxj,byjxc->byxc", oh_v, imgb,
                           preferred_element_type=jnp.float32)
            # horizontal: out[b,y,x] = t[b, y, sx(y,x)] — NOT exact for
            # rotate (sy varies with x); this phase times the pattern only
            cols = jnp.arange(W, dtype=jnp.int32)
            oh_h = (sx[..., None] == cols).astype(jnp.bfloat16)  # [B,H,W,W]
            out = jnp.einsum("byxw,bywc->byxc", oh_h,
                             t.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            out = jnp.where(valid[..., None], out, 128.0)
            return jnp.sum(out[:, ::37, ::37])
        measure(phase, fn, (img,), reps=4)


if __name__ == "__main__":
    main()
