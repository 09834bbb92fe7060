"""Is XLA's filter-gradient (wgrad) conv running at MXU rate or at
reduce/bandwidth rate? Times, at ResNet-50 layer shapes:

  a) jax.grad of lax.conv wrt the filter (XLA's native wgrad)
  b) the same contraction written as an explicit dot_general
     ([M, Cin]^T @ [M, Cout] for 1x1; patch-gather + dot for 3x3)

All loops run inside one jit (fori_loop, data-dependent), scalar fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timeit(name, jit_fn, *args, flops=None, gbytes=None):
    out = jit_fn(*args)
    float(out)
    t0 = time.perf_counter()
    float(jit_fn(*args))
    dt = (time.perf_counter() - t0 - 0.002) / REPS
    msg = f"{name}: {dt*1000:.3f} ms/iter"
    if flops:
        msg += f"  ({flops/dt/1e12:.1f} TF/s)"
    if gbytes:
        msg += f"  ({gbytes/dt:.0f} GB/s)"
    print(msg, flush=True)


def case(B, H, W, cin, cout, k, stride=1):
    rng = np.random.RandomState(0)
    Ho, Wo = H // stride, W // stride
    x = jnp.asarray(rng.randn(B, H, W, cin), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(B, Ho, Wo, cout), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w0 = jnp.asarray(rng.randn(k, k, cin, cout) * 0.01, jnp.bfloat16)

    def wgrad_xla(x, dy):
        _, vjp = jax.vjp(lambda w: conv(x, w), w0)
        return vjp(dy)[0]

    @jax.jit
    def loop_xla(x, dy):
        def body(i, acc):
            g = wgrad_xla(x, dy + jnp.bfloat16(i))
            return acc + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    flops = 2 * B * Ho * Wo * cin * cout * k * k
    gb = (B * H * W * cin * 2 + B * Ho * Wo * cout * 2) / 1e9
    timeit(f"wgrad XLA  {k}x{k} {cin}->{cout} s{stride}", loop_xla, x, dy,
           flops=flops, gbytes=gb)

    if k == 1 and stride == 1:
        @jax.jit
        def loop_dot(x, dy):
            xm = x.reshape(-1, cin)
            def body(i, acc):
                dym = (dy + jnp.bfloat16(i)).reshape(-1, cout)
                g = jax.lax.dot_general(
                    xm, dym, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + jnp.sum(g)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        timeit(f"wgrad dot  {k}x{k} {cin}->{cout} s{stride}", loop_dot, x, dy,
               flops=flops, gbytes=gb)


def main():
    case(128, 56, 56, 64, 256, 1)    # layer1 expand
    case(128, 56, 56, 256, 64, 1)    # layer1 reduce
    case(128, 56, 56, 64, 64, 3)     # layer1 3x3
    case(128, 28, 28, 512, 128, 1)   # layer2 reduce
    case(128, 14, 14, 256, 256, 3)   # layer3 3x3
    case(128, 7, 7, 512, 512, 3)     # layer4 3x3


if __name__ == "__main__":
    main()
