"""Relay-safe microbenchmarks: loop K times inside one jit (lax.fori_loop
with a data dependence), fetch ONE scalar. Measures device time only.

Usage: python perf/microbench2.py [probe ...]
Probes: bw, convbn, bngrad, all
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timeit(name, jit_fn, *args, bytes_per_iter=None, flops_per_iter=None):
    """jit_fn(*args) must reduce to a scalar and internally loop REPS times."""
    out = jit_fn(*args)
    float(out)  # compile + warm
    t0 = time.perf_counter()
    out = jit_fn(*args)
    float(out)  # host fetch of one scalar = reliable barrier
    dt = (time.perf_counter() - t0 - 0.002) / REPS  # ~2ms relay dispatch
    msg = f"{name}: {dt*1000:.3f} ms/iter"
    if bytes_per_iter:
        msg += f"  ({bytes_per_iter/dt/1e9:.0f} GB/s)"
    if flops_per_iter:
        msg += f"  ({flops_per_iter/dt/1e12:.1f} TF/s)"
    print(msg, flush=True)
    return dt


def probe_bw():
    # 2-D, lane-aligned: the realistic activation layout
    m, n = 16384, 8192  # 256M elems bf16 = 512MB
    x = jnp.ones((m, n), jnp.bfloat16)

    @jax.jit
    def mul_loop(x):
        def body(i, x):
            return x * jnp.bfloat16(1.0 + 1e-6 * i)
        y = jax.lax.fori_loop(0, REPS, body, x)
        return jnp.sum(y[:1, :128].astype(jnp.float32))

    timeit("mul 512MB r+w", mul_loop, x, bytes_per_iter=m * n * 4)

    @jax.jit
    def red_loop(x):
        def body(i, acc):
            return acc + jnp.sum((x + jnp.bfloat16(i)).astype(jnp.float32))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    timeit("reduce 512MB read", red_loop, x, bytes_per_iter=m * n * 2)


def _convbn_case(name, cin, cout, k, train_bn, barrier=False):
    B, H, W = 128, 56, 56
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, cin), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)
    scale = jnp.ones((cout,), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def convbn(x, w, scale, bias):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if barrier:
            y = jax.lax.optimization_barrier(y)
        if train_bn:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
            y = ((yf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias)
        return jax.nn.relu(y.astype(jnp.bfloat16))

    @jax.jit
    def loop(x, w, scale, bias):
        def body(i, x):
            return convbn(x[..., :cin], w, scale, bias)[..., :cin] * jnp.bfloat16(0.5)
        y = jax.lax.fori_loop(0, REPS, body, x)
        return jnp.sum(y[:1, :1, :1, :8].astype(jnp.float32))

    flops = 2 * B * H * W * cin * cout * k * k
    io_bytes = B * H * W * (cin + cout) * 2
    timeit(name, loop, x, w, scale, bias,
           bytes_per_iter=io_bytes, flops_per_iter=flops)


def probe_convbn():
    _convbn_case("conv1x1 64->256 (no bn)", 64, 256, 1, False)
    _convbn_case("conv1x1 64->256 + bn", 64, 256, 1, True)
    _convbn_case("conv1x1 64->256 +bar+bn", 64, 256, 1, True, barrier=True)
    _convbn_case("conv3x3 64->64 (no bn)", 64, 64, 3, False)
    _convbn_case("conv3x3 64->64 + bn", 64, 64, 3, True)
    _convbn_case("conv3x3 64->64 +bar+bn", 64, 64, 3, True, barrier=True)


def probe_bngrad():
    """Grad of conv+bn+relu chain at layer1 shapes; loss is scalar already."""
    B, H, W, C = 128, 56, 56, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 64), jnp.bfloat16)
    w = jnp.asarray(rng.randn(1, 1, 64, C) * 0.05, jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def loss(w, scale, bias, x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.sum(jax.nn.relu(z).astype(jnp.float32)) * 1e-6

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def loop(w, scale, bias, x):
        def body(i, carry):
            w, acc = carry
            gw, gs, gb = grad(w, scale, bias, x)
            return (w + gw.astype(jnp.bfloat16) * jnp.bfloat16(1e-9),
                    acc + jnp.sum(gs))
        _, acc = jax.lax.fori_loop(0, REPS, body, (w, jnp.float32(0)))
        return acc

    # traffic: fwd conv r(x)+w(y) skipped (XLA may rematerialize);
    # report time only
    timeit("grad conv1x1+bn+relu", loop, w, scale, bias, x,
           flops_per_iter=3 * 2 * B * H * W * 64 * C)


if __name__ == "__main__":
    which = sys.argv[1:] or ["all"]
    if "bw" in which or "all" in which:
        probe_bw()
    if "convbn" in which or "all" in which:
        probe_convbn()
    if "bngrad" in which or "all" in which:
        probe_bngrad()
