"""Can Pallas matmuls reach XLA-conv speed on this chip? Probes, at
ResNet-50 1x1-conv shapes (M = B*H*W), slope-timed:

  xla_conv      lax.conv 1x1 (the baseline)
  pallas_mm     plain Pallas matmul, M-tiled grid, W resident
  pallas_mm_st  same + f32 sum/sumsq stats epilogue accumulated in VMEM
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf.slope import time_slope, report


def _mm_kernel(x_ref, w_ref, y_ref):
    y_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(y_ref.dtype)


def _mm_stats_kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    acc_ref[0, :] += jnp.sum(y, axis=0)
    acc_ref[1, :] += jnp.sum(jnp.square(y), axis=0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s1_ref[:] = acc_ref[0:1, :]
        s2_ref[:] = acc_ref[1:2, :]


def pallas_mm(x, w, tile_m=512, stats=False):
    M, K = x.shape
    K2, N = w.shape
    grid = (M // tile_m,)
    in_specs = [
        pl.BlockSpec((tile_m, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if not stats:
        return pl.pallas_call(
            _mm_kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x, w)
    return pl.pallas_call(
        _mm_stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((M, N), x.dtype),
                   jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, N), jnp.float32)],
    )(x, w)


def case(tag, M, K, N, mode, tile_m=512, H=56):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N) * 0.03, jnp.bfloat16)
    wb = jnp.asarray(rng.randn(N, K) * 0.03, jnp.bfloat16)

    def build(reps):
        @jax.jit
        def f(x):
            cur = x
            for i in range(reps):
                if mode == "xla_conv":
                    x4 = cur.reshape(128, H, -1, K)
                    y4 = jax.lax.conv_general_dilated(
                        x4, w.reshape(1, 1, K, N), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = y4.reshape(M, N)
                elif mode == "xla_mm":
                    y = jax.lax.dot_general(
                        cur, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
                elif mode == "xla_mm_bn":
                    y32 = jax.lax.dot_general(
                        cur, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    mean = jnp.mean(y32, axis=0)
                    var = jnp.mean(jnp.square(y32), axis=0) - jnp.square(mean)
                    y = ((y32 - mean) * jax.lax.rsqrt(var + 1e-5)
                         ).astype(jnp.bfloat16)
                elif mode == "xla_mm_bn_bf16out":
                    yb = jax.lax.dot_general(
                        cur, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
                    yf = yb.astype(jnp.float32)
                    mean = jnp.mean(yf, axis=0)
                    var = jnp.mean(jnp.square(yf), axis=0) - jnp.square(mean)
                    s_ = jax.lax.rsqrt(var + 1e-5).astype(jnp.bfloat16)
                    y = (yb - mean.astype(jnp.bfloat16)) * s_
                elif mode == "pallas_mm":
                    y = pallas_mm(cur, w, tile_m, stats=False)
                elif mode == "pallas_mm_st":
                    y, s1, s2 = pallas_mm(cur, w, tile_m, stats=True)
                cur = jax.lax.dot_general(
                    y, wb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                cur = cur + x * jnp.bfloat16(1e-3)
            return jnp.sum(cur[:1, :8].astype(jnp.float32))
        return f, (x,)

    ms = time_slope(build, 6, 30)
    flops = 2 * M * K * N * 2  # incl. reproject
    report(f"{tag} [{mode}]", ms, flops=flops,
           gbytes=M * (K + N) * 2 / 1e9)


def main():
    which = sys.argv[1:] or ["l1"]
    if "l1" in which:
        M = 128 * 56 * 56
        case("M=401k 64->256", M, 64, 256, "xla_conv")
        case("M=401k 64->256", M, 64, 256, "xla_mm")
        case("M=401k 64->256", M, 64, 256, "pallas_mm")
        case("M=401k 64->256", M, 64, 256, "pallas_mm_st")
    if "tiles" in which:
        M = 128 * 56 * 56
        for tm in (2048, 4096, 8192, 16384):
            case(f"M=401k 64->256 tm={tm}", M, 64, 256, "pallas_mm",
                 tile_m=tm)
        case("M=401k 64->256 tm=8192", M, 64, 256, "pallas_mm_st",
             tile_m=8192)
    if "mmbn" in which:
        M = 128 * 56 * 56
        case("M=401k 64->256", M, 64, 256, "xla_mm_bn")
        case("M=401k 64->256", M, 64, 256, "xla_mm_bn_bf16out")
        M2 = 128 * 28 * 28
        case("M=100k 128->512", M2, 128, 512, "xla_mm")
        case("M=100k 128->512", M2, 128, 512, "xla_mm_bn")
    if "l2" in which:
        M = 128 * 28 * 28
        case("M=100k 128->512", M, 128, 512, "xla_conv", H=28)
        case("M=100k 128->512", M, 128, 512, "pallas_mm")
        case("M=100k 128->512", M, 128, 512, "pallas_mm_st")


if __name__ == "__main__":
    main()
