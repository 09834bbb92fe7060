"""Peak Pallas bandwidth on this chip: trivial copy / scale kernels at
various tile sizes, slope-timed. If these can't reach XLA's ~1TB/s
elementwise rate, Pallas kernels can never win bandwidth-bound ops here."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf.slope import time_slope, report

M, N = 401408, 256  # the layer1 activation shape [B*H*W, C]


def _scale_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.bfloat16(1.0001)


def pallas_scale(x, tile_m):
    return pl.pallas_call(
        _scale_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_m, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def case(tag, fn):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, N), jnp.bfloat16)

    def build(reps):
        @jax.jit
        def f(x):
            cur = x
            for i in range(reps):
                cur = fn(cur) + x * jnp.bfloat16(1e-3)
            return jnp.sum(cur[:1, :8].astype(jnp.float32))
        return f, (x,)

    ms = time_slope(build, 6, 30)
    # traffic: read cur + write out (+ read x + write for the chain-add,
    # which XLA fuses into one extra r+w pass)
    report(tag, ms, gbytes=M * N * 2 * 2 / 1e9)


def main():
    case("xla scale (baseline)",
         lambda c: c * jnp.bfloat16(1.0001))
    for tm in (1024, 4096, 8192):
        case(f"pallas scale tm={tm}",
             lambda c, tm=tm: pallas_scale(c, tm))


if __name__ == "__main__":
    main()
