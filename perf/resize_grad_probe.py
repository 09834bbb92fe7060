"""Hypothesis probe for the SAM train-step pathology (engine step 1751ms vs
~210ms forward): the VJP of jax.image.resize's 256->1024 bilinear upsample
on the 4 output masks lowers to a scatter-add.

Times fwd and fwd+bwd of
  image_resize   jax.image.resize bilinear (model's current path)
  matmul_resize  R_h @ x @ R_w^T with R = resize(eye) — exact same linear
                 map, MXU-friendly, backward is also matmuls

Run: python perf/resize_grad_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, S_IN, S_OUT = 1, 4, 256, 1024


def image_resize(x):
    return jax.image.resize(x, (B, K, S_OUT, S_OUT), "bilinear")


def _resize_matrix(n_in, n_out):
    eye = jnp.eye(n_in, dtype=jnp.float32)
    # resize columns of the identity: row r of R holds the interp weights
    return jax.image.resize(eye, (n_in, n_out), "bilinear").T  # [out, in]


def matmul_resize(x):
    r = _resize_matrix(S_IN, S_OUT)                    # [1024, 256]
    y = jnp.einsum("oh,bkhw->bkow", r, x)
    return jnp.einsum("ow,bkhw->bkho", r, y)


def slope(fn, x, lo=4, hi=12):
    res = {}
    for reps in (lo, hi):
        @jax.jit
        def chain(x, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                y = fn(x)
                acc = acc + jnp.sum(y) * 1e-6
                x = x + y[:, :, ::4, ::4] * 1e-6
            return acc
        float(chain(x))
        t0 = time.perf_counter()
        float(chain(x))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def slope_grad(fn, x, lo=2, hi=8):
    res = {}
    for reps in (lo, hi):
        def loss(x, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(_r):
                y = fn(x)
                acc = acc + jnp.sum(y ** 2) * 1e-9
                x = x + y[:, :, ::4, ::4] * 1e-6
            return acc
        g = jax.jit(jax.grad(loss))
        float(jnp.sum(g(x)))
        t0 = time.perf_counter()
        float(jnp.sum(g(x)))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K, S_IN, S_IN), jnp.float32)

    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?")}
    a = np.asarray(jax.jit(image_resize)(x))
    b = np.asarray(jax.jit(matmul_resize)(x))
    out["maxerr"] = float(np.abs(a - b).max())
    print(json.dumps(out), flush=True)

    for name, fn in (("image_resize", image_resize),
                     ("matmul_resize", matmul_resize)):
        out[f"{name}_fwd_ms"] = round(slope(fn, x) * 1000, 3)
        out[f"{name}_fwdbwd_ms"] = round(slope_grad(fn, x) * 1000, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
