"""Cost model for TPU 1-D slice gathers: per-index cost vs (count, slice).

The production warp gather (take_along_axis of 32-f32 slices, 50k indices
per image) runs at ~9.4ns/index (60ms for b128 224^2).  This probe maps the
per-index cost over index count x slice width to find whether fewer,
wider slices are cheaper — the design space for a block-structured warp:

  count 50176/img x slice  32 f32 — the production warp (baseline)
  count 12544/img x slice 128 f32 — 4 px/slice (C pad 8)
  count  3136/img x slice 512 f32 — 16 px/slice (C pad 4 view, 128 px span)
  count  3584/img x slice 768 f32 — full 224-px source rows (C=3 packed)

Also times the vertical one-hot select einsum ("byxh,bhxc->byxc") as the
matmul-alternative reference point (horizontal was 8.56ms:
perf/warp_variants_probe.py onehot_shear).

Usage: python -u perf/gather_cost_model.py [phase ...]
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
    return dt


def gather_case(name, n_slices, slice_f32, rows):
    """take_along_axis of [B, rows, slice_f32] with [B, n_slices] indices."""
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, rows, slice_f32).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, rows, (B, n_slices, 1)).astype(np.int32))

    def fn(s, i):
        out = jnp.take_along_axis(s, i, axis=1)
        return out[:, ::97, ::29]
    dt = measure(name, fn, src, idx)
    tot = B * n_slices
    print(f"  -> {dt*1e9/tot:.2f} ns/index ({tot/1e6:.2f}M indices, "
          f"{tot*slice_f32*4/dt/1e9:.0f} GB/s slice bytes)", flush=True)


def main():
    phases = sys.argv[1:] or ["g50k_s32", "g12k_s128", "g3k_s512",
                              "g3k_s768row", "vsel_onehot"]

    if "g50k_s32" in phases:
        gather_case("g50k_s32", H * W, 32, H * W)
    if "g12k_s128" in phases:
        gather_case("g12k_s128", H * W // 4, 128, H * W // 4)
    if "g3k_s512" in phases:
        gather_case("g3k_s512", H * W // 16, 512, H * W // 16)
    if "g3k_s768row" in phases:
        gather_case("g3k_s768row", 28 * 128, 768, H)

    if "vsel_onehot" in phases:
        # exact per-pixel row select t[b,y,x]=img[b, sy(y,x), x] as a
        # per-(b,x) [H,H]@[H,C] one-hot matmul, scanned in column blocks
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randint(0, 256, (B, H, W, C))
                          .astype(np.float32))
        syn = jnp.asarray(rng.randint(0, H, (B, H, W)).astype(np.int32))

        def fn(x, sy):
            xb = x.astype(jnp.bfloat16)

            def blk(carry, xs):
                oh = jax.nn.one_hot(sy[:, :, xs], H,
                                    dtype=jnp.bfloat16)    # [B,H,16,Hs]
                o = jnp.einsum("byxh,bhxc->byxc", oh, xb[:, :, xs],
                               preferred_element_type=jnp.float32)
                return carry, o
            xsb = jnp.arange(W).reshape(-1, 16)
            _, outs = jax.lax.scan(blk, 0, xsb)
            out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, W, C)
            return out[:, ::37, ::37]
        measure("vsel_onehot", fn, img, syn)


if __name__ == "__main__":
    main()
