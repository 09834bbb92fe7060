"""Direct HBM bandwidth probes (single jit calls, host-fetch barrier)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, f, *args, reps=10, bytes_moved=None):
    v = f(*args)
    jax.tree.map(lambda x: np.asarray(x), v)
    t0 = time.perf_counter()
    for _ in range(reps):
        v = f(*args)
    jax.tree.map(lambda x: np.asarray(x), v)
    dt = (time.perf_counter() - t0) / reps
    bw = (bytes_moved / dt / 1e9) if bytes_moved else 0
    print(f"{name}: {dt*1000:.3f} ms  ({bw:.0f} GB/s)", flush=True)


def main():
    n = 256 * 1024 * 1024  # 512MB bf16
    x = jnp.zeros((n,), jnp.bfloat16)

    @jax.jit
    def red(x):
        return jnp.sum(x.astype(jnp.float32))

    t("reduce 512MB (read)", red, x, bytes_moved=n * 2)

    @jax.jit
    def copy(x):
        return x * jnp.bfloat16(1.0001)

    t("mul 512MB (r+w)", copy, x, bytes_moved=n * 4)

    # scan-carry overhead probe: same mul, 50 iters inside one jit
    m = 16 * 1024 * 1024  # 32MB bf16
    y = jnp.zeros((m,), jnp.bfloat16)

    @jax.jit
    def scan_mul(y):
        def body(c, _):
            return c * jnp.bfloat16(1.0001), ()
        out, _ = jax.lax.scan(body, y, None, length=50)
        return jnp.sum(out.astype(jnp.float32))

    v = scan_mul(y)
    float(v)
    t0 = time.perf_counter()
    float(scan_mul(y))
    dt = time.perf_counter() - t0 / 1
    print(f"scan mul 32MB x50: {dt/50*1000:.3f} ms/iter "
          f"({m*4/ (dt/50)/1e9:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
