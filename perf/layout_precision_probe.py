"""Round-3 ResNet-50 levers (VERDICT r2 #4): conv layout variants and
precision / preferred_element_type on fwd+bwd convs, slope-timed on chip.

Probes a layer2-shaped conv3x3 (56x56, 128ch) and conv1x1 (64->256) with
train-BN stats attached — the op class that carries the measured ~3x
reduce penalty — under:
  * NHWC (model default) vs NCHW dimension_numbers,
  * default vs HIGHEST precision,
  * preferred_element_type f32 (default) vs bf16 on the conv,
for forward and forward+backward (value_and_grad through conv+BN-stats).

Run: python perf/layout_precision_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C_IN, C_OUT = 128, 56, 56, 64, 256


def make_conv(dn, precision, out_dtype):
    lhs_spec, rhs_spec, out_spec = dn

    def raw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=(lhs_spec, rhs_spec, out_spec),
            precision=precision,
            preferred_element_type=out_dtype)

    if out_dtype == jnp.bfloat16:
        return raw

    # f32 accumulator output: cotangent arrives f32; cast it to bf16 for
    # the transpose convs (production mixed-precision semantics) so the
    # bwd doesn't hit lax's same-dtype requirement
    @jax.custom_vjp
    def conv(x, w):
        return raw(x, w)

    def fwd(x, w):
        return raw(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        gb = g.astype(jnp.bfloat16)
        _, vjp = jax.vjp(lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME",
            dimension_numbers=(lhs_spec, rhs_spec, out_spec),
            precision=precision), x, w)
        return vjp(gb)

    conv.defvjp(fwd, bwd)
    return conv


def with_bn_stats(conv, out_spec):
    c_axis = out_spec.index("C")
    red = tuple(i for i in range(4) if i != c_axis)

    def f(x, w):
        y = conv(x, w)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, red)
        var = jnp.mean(yf * yf, red) - mean * mean
        return y, mean, var
    f.c_axis = c_axis
    return f


def slope(fn, args, lo=6, hi=18):
    res = {}
    for reps in (lo, hi):
        @jax.jit
        def chain(x, w, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for i in range(_r):
                y, m, v = fn(x, w)
                acc = acc + jnp.sum(m) + jnp.sum(v)
                # data dependency without changing x's layout/shape:
                # reduce y's channel axis to 1 and broadcast-add
                dep = jnp.mean(y.astype(jnp.float32), axis=fn.c_axis,
                               keepdims=True)
                x = x + dep.astype(x.dtype) * 1e-6
            return acc + jnp.sum(x.astype(jnp.float32)) * 0
        float(chain(*args))
        t0 = time.perf_counter()
        float(chain(*args))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def slope_grad(fn, args, lo=4, hi=12):
    res = {}
    for reps in (lo, hi):
        def loss(x, w, _r=reps):
            acc = jnp.zeros((), jnp.float32)
            for i in range(_r):
                y, m, v = fn(x, w)
                acc = acc + jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6 + \
                    jnp.sum(m) + jnp.sum(v)
            return acc
        g = jax.jit(jax.grad(loss, argnums=1))
        float(jnp.sum(g(*args)))
        t0 = time.perf_counter()
        float(jnp.sum(g(*args)))
        res[reps] = time.perf_counter() - t0
    return (res[hi] - res[lo]) / (hi - lo)


def main():
    rng = np.random.RandomState(0)
    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?"),
           "shape": f"{B}x{H}x{W}x{C_IN}->{C_OUT} conv1x1 + BN stats"}

    cases = {
        "nhwc_default_f32out": (("NHWC", "HWIO", "NHWC"), None, jnp.float32),
        "nhwc_default_bf16out": (("NHWC", "HWIO", "NHWC"), None,
                                 jnp.bfloat16),
        "nhwc_highest_f32out": (("NHWC", "HWIO", "NHWC"),
                                jax.lax.Precision.HIGHEST, jnp.float32),
        "nchw_default_f32out": (("NCHW", "OIHW", "NCHW"), None, jnp.float32),
        "nchw_default_bf16out": (("NCHW", "OIHW", "NCHW"), None,
                                 jnp.bfloat16),
    }
    for name, (dn, prec, odt) in cases.items():
        if dn[0] == "NHWC":
            x = jnp.asarray(rng.randn(B, H, W, C_IN), jnp.bfloat16)
            w = jnp.asarray(rng.randn(1, 1, C_IN, C_OUT) * 0.05,
                            jnp.bfloat16)
        else:
            x = jnp.asarray(rng.randn(B, C_IN, H, W), jnp.bfloat16)
            w = jnp.asarray(rng.randn(C_OUT, C_IN, 1, 1) * 0.05,
                            jnp.bfloat16)
        fn = with_bn_stats(make_conv(dn, prec, odt), dn[2])
        try:
            out[f"{name}_fwd_ms"] = round(slope(fn, (x, w)) * 1000, 3)
            out[f"{name}_fwdbwd_ms"] = round(slope_grad(fn, (x, w)) * 1000,
                                             3)
        except Exception as e:
            out[name] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
