"""Isolate the conv+BN-stats fusion cost on the chip.

Times standalone jitted fns at ResNet-50 layer1 shapes (B=128, 56x56):
  conv_only      1x1 conv 64->256 bf16
  conv_bn        conv + train-mode BN (stats fused into conv epilogue)
  conv_bar_bn    conv + optimization_barrier + BN (stats in separate pass)
  conv3_only     3x3 conv 64->64
  conv3_bn       3x3 conv + BN
  grad_conv_bn   full value_and_grad of conv+BN+relu mean
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 128, 56, 56
ITERS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0] if x.ndim else x), out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    r = jax.tree.leaves(out)[0]
    np.asarray(r).ravel()[0]
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1000:.3f} ms")
    return dt


def bn_train(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return y.astype(x.dtype), mean, var


def main():
    rng = np.random.RandomState(0)
    x64 = jnp.asarray(rng.randn(B, H, W, 64), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(1, 1, 64, 256) * 0.1, jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    scale3 = jnp.ones((64,), jnp.float32)
    bias3 = jnp.zeros((64,), jnp.float32)

    def conv(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_only(x, w):
        return conv(x, w, "VALID")

    @jax.jit
    def conv_bn(x, w, s, b):
        y = conv(x, w, "VALID")
        return bn_train(y, s, b)

    @jax.jit
    def conv_bar_bn(x, w, s, b):
        y = conv(x, w, "VALID")
        y = jax.lax.optimization_barrier(y)
        return bn_train(y, s, b)

    @jax.jit
    def conv3_only(x, w):
        return conv(x, w, "SAME")

    @jax.jit
    def conv3_bn(x, w, s, b):
        y = conv(x, w, "SAME")
        return bn_train(y, s, b)

    @jax.jit
    def conv3_bar_bn(x, w, s, b):
        y = conv(x, w, "SAME")
        y = jax.lax.optimization_barrier(y)
        return bn_train(y, s, b)

    def loss(w, s, b):
        y, m, v = bn_train(conv(x64, w, "VALID"), s, b)
        return jnp.sum(jax.nn.relu(y).astype(jnp.float32))

    grad_fn = jax.jit(jax.grad(loss))

    timeit("conv1x1_only   ", conv_only, x64, w1)
    timeit("conv1x1_bn     ", conv_bn, x64, w1, scale, bias)
    timeit("conv1x1_bar_bn ", conv_bar_bn, x64, w1, scale, bias)
    timeit("conv3x3_only   ", conv3_only, x64, w3)
    timeit("conv3x3_bn     ", conv3_bn, x64, w3, scale3, bias3)
    timeit("conv3x3_bar_bn ", conv3_bar_bn, x64, w3, scale3, bias3)
    timeit("grad_conv1x1_bn", grad_fn, w1, scale, bias)

    # rooflines
    flops1 = 2 * B * H * W * 64 * 256
    flops3 = 2 * B * H * W * 64 * 64 * 9
    print(f"conv1x1 flops {flops1/1e9:.1f} G -> {flops1/197e12*1000:.3f} ms @peak")
    print(f"conv3x3 flops {flops3/1e9:.1f} G -> {flops3/197e12*1000:.3f} ms @peak")
    bw = 819e9
    b1 = (B*H*W*64*2 + B*H*W*256*2)
    print(f"conv1x1 bytes {b1/1e6:.0f} MB -> {b1/bw*1000:.3f} ms @BW")


if __name__ == "__main__":
    main()
