"""True per-op times for the ResNet-50 hot conv/BN shapes (slope timing).

Cases (all B=128, NHWC, bf16 in/out, f32 stats):
  convN       - conv alone
  convN+bn    - conv + train-BN stats+normalize (XLA's conv+reduce fusion)
  bnrelu+convN- normalize+relu of input, then conv (the real fwd chain)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perf.slope import time_slope, report

B = 128


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_train(y, scale, bias):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
    return ((yf - mean) * jax.lax.rsqrt(var + 1e-5) * scale
            + bias).astype(y.dtype)


def case(tag, H, cin, cout, k, mode, stride=1):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, cin), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.03, jnp.bfloat16)
    wb = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.03, jnp.bfloat16)
    scale_in = jnp.ones((cin,), jnp.float32)
    bias_in = jnp.zeros((cin,), jnp.float32)
    scale_out = jnp.ones((cout,), jnp.float32)
    bias_out = jnp.zeros((cout,), jnp.float32)

    def build(reps):
        @jax.jit
        def f(x):
            cur = x
            for i in range(reps):
                if mode == "conv":
                    y = conv(cur, w, stride)
                elif mode == "conv_bn":
                    y = bn_train(conv(cur, w, stride), scale_out, bias_out)
                elif mode == "conv_bn_split":
                    # barrier ONLY the stats read; normalize stays an
                    # elementwise consumer of the raw conv output
                    y0 = conv(cur, w, stride)
                    yb = jax.lax.optimization_barrier(y0).astype(jnp.float32)
                    mean = jnp.mean(yb, axis=(0, 1, 2))
                    var = (jnp.mean(jnp.square(yb), axis=(0, 1, 2))
                           - jnp.square(mean))
                    rstd = jax.lax.rsqrt(var + 1e-5)
                    s = (scale_out * rstd).astype(y0.dtype)
                    t = (bias_out - scale_out * rstd * mean).astype(y0.dtype)
                    y = y0 * s + t
                elif mode == "bnrelu_conv":
                    xn = jax.nn.relu(
                        bn_train(cur, scale_in, bias_in))
                    y = conv(xn, w, stride)
                # project back to input shape with a 1x1 so the chain is
                # data-dependent without growing; cheap vs the measured op
                cur = conv(y, wb)[:, ::stride and 1, :, :] if stride == 1 \
                    else None
                if stride != 1:
                    raise ValueError("stride>1 unsupported in chain")
                cur = cur + x * jnp.bfloat16(1e-3)
            return jnp.sum(cur[:1, :1, :1, :8].astype(jnp.float32))
        return f, (x,)

    ms = time_slope(build, 6, 30)
    flops = 2 * B * H * H * cin * cout * k * k
    gbytes = B * H * H * (cin + cout) * 2 / 1e9
    # NOTE: measured chain step = target op + a 1x1 cout->cin reproject
    proj_flops = 2 * B * H * H * cout * cin
    report(f"{tag} [{mode}] (+reproject {proj_flops/1e9:.1f}GF)", ms,
           flops=flops + proj_flops, gbytes=gbytes)


def main():
    which = sys.argv[1:] or ["l1"]
    if "l1" in which:
        case("56x56 64->256 1x1", 56, 64, 256, 1, "conv")
        case("56x56 64->256 1x1", 56, 64, 256, 1, "conv_bn")
        case("56x56 64->256 1x1", 56, 64, 256, 1, "bnrelu_conv")
    if "split" in which:
        case("56x56 64->256 1x1", 56, 64, 256, 1, "conv_bn_split")
        case("56x56 64->64 3x3", 56, 64, 64, 3, "conv_bn_split")
        case("28x28 128->512 1x1", 28, 128, 512, 1, "conv_bn")
        case("28x28 128->512 1x1", 28, 128, 512, 1, "conv_bn_split")
    if "l13x3" in which:
        case("56x56 64->64 3x3", 56, 64, 64, 3, "conv")
        case("56x56 64->64 3x3", 56, 64, 64, 3, "conv_bn")
    if "l3" in which:
        case("14x14 256->1024 1x1", 14, 256, 1024, 1, "conv")
        case("14x14 256->1024 1x1", 14, 256, 1024, 1, "conv_bn")
        case("14x14 256->256 3x3", 14, 256, 256, 3, "conv")
        case("14x14 256->256 3x3", 14, 256, 256, 3, "conv_bn")


if __name__ == "__main__":
    main()
