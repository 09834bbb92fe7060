"""Isolated MSDA-style row-gather encodings on TPU.

Shape: value [BH=8, S=21760, D=32] f32; indices [BH, N=348160] (= lq 21760 x
P 16 taps); gathered rows summed so only the gather is timed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BH, S, D = 8, 21760, 32
N = 21760 * 16


def timeit(name, f, *args, reps=5):
    v = f(*args)
    float(jnp.sum(v)) if hasattr(v, "shape") else v
    t0 = time.perf_counter()
    for _ in range(reps):
        v = f(*args)
    float(jnp.sum(v))
    dt = (time.perf_counter() - t0) / reps
    gb = BH * N * D * 4 / 1e9
    print(f"{name}: {dt*1000:.2f} ms ({gb/dt:.0f} GB/s)", flush=True)


def main():
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(BH, S, D), jnp.float32)
    idx = jnp.asarray(rng.randint(0, S, size=(BH, N)), jnp.int32)

    @jax.jit
    def take_along(v, i):
        out = jnp.take_along_axis(v, i[..., None], axis=1)
        return jnp.sum(out, axis=(1, 2))

    @jax.jit
    def take_clip(v, i):
        # vmap over BH, jnp.take along axis 0
        out = jax.vmap(lambda vv, ii: jnp.take(vv, ii, axis=0, mode="clip")
                       )(v, i)
        return jnp.sum(out, axis=(1, 2))

    @jax.jit
    def onehot_chunked(v, i):
        # chunked one-hot matmul: scan over 16 chunks of N/16 indices
        chunks = i.reshape(BH, 16, N // 16)

        def body(c, ii):
            oh = jax.nn.one_hot(ii, S, dtype=jnp.bfloat16)   # [BH, n, S]
            out = jnp.einsum("bns,bsd->bnd", oh, v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return c + jnp.sum(out, axis=(1, 2)), None
        init = jnp.zeros((BH,), jnp.float32)
        out, _ = jax.lax.scan(body, init, jnp.moveaxis(chunks, 1, 0))
        return out

    @jax.jit
    def take_d128(v, i):
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 96)))
        out = jnp.take_along_axis(vp, i[..., None], axis=1)
        return jnp.sum(out[..., :D], axis=(1, 2))

    timeit("take_along_axis ", take_along, value, idx)
    timeit("vmap jnp.take   ", take_clip, value, idx)
    timeit("take d128-padded", take_d128, value, idx)
    timeit("onehot bf16 x16 ", onehot_chunked, value, idx)


if __name__ == "__main__":
    main()
