"""Is the ViT-B FFN GEMM slow because XLA keeps [B, T, C] unflattened?

Times fwd+bwd of the fc1+gelu+fc2 MLP at the production [128,197,768]
3-D shape vs an explicitly flattened [128*197,768] 2-D shape, and the
attention projections likewise. Slope-timed chains.

Usage: python -u perf/vit_gemm_shape_probe.py
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

B, T, C, F = 128, 197, 768, 3072


def slope(name, fn, args, reps=(2, 6), outer=3):
    def chain(k, *a):
        x = a[0]
        for i in range(k):
            x = fn(x, *a[1:]) * (1.0 + 1e-6 * i)
        return jnp.sum(x[..., ::37].astype(jnp.float32))

    times = {}
    for k in reps:
        f = jax.jit(lambda *a: chain(k, *a))
        float(f(*args))
        t0 = time.perf_counter()
        for _ in range(outer):
            out = f(*args)
        float(out)
        times[k] = (time.perf_counter() - t0) / outer
    k0, k1 = reps
    per = (times[k1] - times[k0]) / (k1 - k0)
    flops = 2 * B * T * C * F * 2 * 3  # fc1+fc2, fwd+2 bwd matmuls each
    print(f"{name:26s} {per * 1000:8.2f} ms  "
          f"({flops / per / 1e12:.1f} TFLOP/s eff)", flush=True)
    return per


def main():
    r = np.random.RandomState(0)
    w1 = jnp.asarray(r.randn(C, F) * 0.02, jnp.float32)
    w2 = jnp.asarray(r.randn(F, C) * 0.02, jnp.float32)
    x3 = jnp.asarray(r.randn(B, T, C) * 0.1, jnp.bfloat16)
    x2 = x3.reshape(B * T, C)

    def mlp(x, w1, w2):
        h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=False)
        return jnp.dot(h, w2.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)

    def mlp_grad(x, w1, w2):
        def loss(x):
            return jnp.sum(mlp(x, w1, w2).astype(jnp.float32) ** 2) * 1e-6
        g = jax.grad(loss)(x)
        return x + g.astype(x.dtype)

    slope("mlp_fwd_3d [B,T,C]", lambda x: mlp(x, w1, w2), (x3,))
    slope("mlp_fwd_2d [B*T,C]", lambda x: mlp(x, w1, w2), (x2,))
    slope("mlp_fwdbwd_3d", lambda x: mlp_grad(x, w1, w2), (x3,))
    slope("mlp_fwdbwd_2d", lambda x: mlp_grad(x, w1, w2), (x2,))

    # 3-d input but flattened INSIDE the fn (reshape is supposedly free)
    def mlp_reshaped(x, w1, w2):
        return mlp(x.reshape(B * T, C), w1, w2).reshape(B, T, C)

    def mlp_reshaped_grad(x, w1, w2):
        def loss(x):
            return jnp.sum(
                mlp_reshaped(x, w1, w2).astype(jnp.float32) ** 2) * 1e-6
        return x + jax.grad(loss)(x).astype(x.dtype)

    slope("mlp_fwdbwd_3d_reshaped", lambda x: mlp_reshaped_grad(x, w1, w2),
          (x3,))


if __name__ == "__main__":
    main()
