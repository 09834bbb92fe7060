"""Per-iteration overhead of fori_loop on this backend: empty body, scalar
carry, plus a tiny-op body. Everything else in perf/ must subtract this."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(reps):
    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + jnp.float32(1.0)
        return jax.lax.fori_loop(0, reps, body, x)

    float(loop(jnp.float32(0)))
    t0 = time.perf_counter()
    float(loop(jnp.float32(0)))
    dt = time.perf_counter() - t0
    print(f"scalar loop x{reps}: {dt*1000:.2f} ms total "
          f"({dt/reps*1000:.3f} ms/iter)", flush=True)


def run_small_op(reps):
    x = jnp.ones((1024, 512), jnp.bfloat16)  # 1MB

    @jax.jit
    def loop(x):
        def body(i, x):
            return x * jnp.bfloat16(1.0001)
        y = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(y[:1, :8].astype(jnp.float32))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = time.perf_counter() - t0
    print(f"1MB-mul loop x{reps}: {dt*1000:.2f} ms total "
          f"({dt/reps*1000:.3f} ms/iter)", flush=True)


def run_unrolled(reps):
    x = jnp.ones((16384, 8192), jnp.bfloat16)  # 268MB

    @jax.jit
    def unrolled(x):
        for i in range(reps):
            x = x * jnp.bfloat16(1.0 + 1e-6 * i)
        return jnp.sum(x[:1, :128].astype(jnp.float32))

    float(unrolled(x))
    t0 = time.perf_counter()
    float(unrolled(x))
    dt = time.perf_counter() - t0
    n = 16384 * 8192
    print(f"268MB-mul UNROLLED x{reps}: {dt*1000:.2f} ms total "
          f"({dt/reps*1000:.3f} ms/iter, {n*4/(dt/reps)/1e9:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    run(20)
    run(100)
    run_small_op(100)
    run_unrolled(20)
