"""Device-side per-op cost via scan-chained ops inside ONE jit (the relay
makes per-dispatch timing useless; a 50-iteration dependent chain amortizes
dispatch to ~0 and forces sequential device execution).

All at ResNet-50 layer1 shape [128,56,56,64] unless noted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 128, 56, 56, 64
ITERS = 50


def chain_time(name, f, x0, *extra):
    @jax.jit
    def run(x, *e):
        def body(carry, _):
            return f(carry, *e), ()
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(y.astype(jnp.float32))

    v = run(x0, *extra)
    float(v)  # compile+complete
    t0 = time.perf_counter()
    float(run(x0, *extra))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1000:.4f} ms/op", flush=True)
    return dt


def bn(x, scale, bias, stats_dtype):
    xf = x.astype(stats_dtype)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * jax.lax.rsqrt(
        var.astype(jnp.float32) + 1e-5) * scale + bias
    return y.astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(1, 1, C, C) * 0.05, jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    chain_time("identity_mul    ", lambda x: x * jnp.bfloat16(1.0001), x)
    chain_time("conv3x3         ", conv, x, w)
    chain_time("conv1x1         ", conv, x, w1)
    chain_time("conv3x3+relu    ", lambda x, w: jax.nn.relu(conv(x, w)), x, w)
    chain_time("bn_f32 only     ", lambda x, s, b: bn(x, s, b, jnp.float32),
               x, scale, bias)
    chain_time("conv3x3+bn_f32  ",
               lambda x, w, s, b: bn(conv(x, w), s, b, jnp.float32),
               x, w, scale, bias)
    chain_time("conv3x3+bn_bf16 ",
               lambda x, w, s, b: bn(conv(x, w), s, b, jnp.bfloat16),
               x, w, scale, bias)
    chain_time("conv3x3+bn+relu ",
               lambda x, w, s, b: jax.nn.relu(bn(conv(x, w), s, b,
                                                 jnp.float32)),
               x, w, scale, bias)

    # wider channels: layer4-ish [128,7,7,512] with 3x3 512->512
    x4 = jnp.asarray(rng.randn(128, 7, 7, 512) * 0.1, jnp.bfloat16)
    w4 = jnp.asarray(rng.randn(3, 3, 512, 512) * 0.02, jnp.bfloat16)
    chain_time("conv3x3_512@7   ", conv, x4, w4)

    x2 = jnp.asarray(rng.randn(128, 28, 28, 128) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.03, jnp.bfloat16)
    chain_time("conv3x3_128@28  ", conv, x2, w2)
    s2 = jnp.ones((128,), jnp.float32)
    b2 = jnp.zeros((128,), jnp.float32)
    chain_time("conv+bn_128@28  ",
               lambda x, w, s, b: bn(conv(x, w), s, b, jnp.float32),
               x2, w2, s2, b2)

    # rooflines
    fl3 = 2 * B * H * W * C * C * 9
    print(f"conv3x3 roofline: {fl3/197e12*1000:.4f} ms @peak; "
          f"BW {2*2*B*H*W*C/819e9*1000:.4f} ms")
    fl4 = 2 * 128 * 7 * 7 * 512 * 512 * 9
    print(f"conv3x3_512@7 roofline: {fl4/197e12*1000:.4f} ms @peak")
    fl2 = 2 * 128 * 28 * 28 * 128 * 128 * 9
    print(f"conv3x3_128@28 roofline: {fl2/197e12*1000:.4f} ms @peak")


if __name__ == "__main__":
    main()
