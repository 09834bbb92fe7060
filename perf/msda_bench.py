"""MSDA XLA-core cost at DINO-DETR shapes on the chip, vs memory roofline.

Encoder self-attn MSDA is the heavy call: lq == S (all tokens query).
Traffic lower bound per call (fwd): 4 bilinear corners x L x P gathered
rows of d bf16/f32 + locations/weights + output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_tpu.ops.msda import ms_deform_attn_xla


def bench(b, shapes, lq, heads=8, d=32, L=4, P=4, iters=20, tag=""):
    rng = np.random.RandomState(0)
    s = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(b, s, heads, d), jnp.float32)
    loc = jnp.asarray(rng.rand(b, lq, heads, L, P, 2), jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(
        rng.randn(b, lq, heads, L, P), jnp.float32).reshape(b, lq, heads, -1),
        -1).reshape(b, lq, heads, L, P)

    @jax.jit
    def fwd(v, l, w):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, w))

    @jax.jit
    def fwdbwd(v, l, w):
        return jax.grad(lambda *a: jnp.sum(
            ms_deform_attn_xla(a[0], shapes, a[1], a[2])**2),
            argnums=(0, 1, 2))(v, l, w)

    float(fwd(value, loc, wts))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(value, loc, wts)
    float(r)
    t_fwd = (time.perf_counter() - t0) / iters

    g = fwdbwd(value, loc, wts)
    float(jnp.sum(g[1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fwdbwd(value, loc, wts)
    float(jnp.sum(g[1]))
    t_bwd = (time.perf_counter() - t0) / iters

    # gather traffic lower bound: 4 corners x (b lq heads L P) rows x d f32
    rows = 4 * b * lq * heads * L * P
    gather_bytes = rows * d * 4
    io_bytes = (loc.size + wts.size + b * lq * heads * d) * 4
    total = gather_bytes + io_bytes
    print(f"{tag}: fwd {t_fwd*1000:.2f} ms  fwd+bwd {t_bwd*1000:.2f} ms  "
          f"min-traffic {total/1e6:.0f} MB -> {total/819e9*1000:.2f} ms "
          f"@819GB/s ({total/t_fwd/1e9:.0f} GB/s achieved fwd)", flush=True)


if __name__ == "__main__":
    # DINO-DETR encoder @1024^2: levels 128^2..16^2, self-attn queries
    enc_shapes = ((128, 128), (64, 64), (32, 32), (16, 16))
    s = sum(h * w for h, w in enc_shapes)
    bench(2, enc_shapes, s, tag=f"encoder b=2 lq={s}")
    # decoder: 900 queries
    bench(16, enc_shapes, 900, tag="decoder b=16 lq=900")
