"""Minimal-HBM-traffic training BatchNorm (custom VJP).

Training-mode BatchNorm is pure bandwidth on TPU: the math is trivial, the
cost is passes over the activation. jax's autodiff of the naive formulation
can materialize extra f32 intermediates and split the backward reductions
into several passes. This implementation pins the pass structure explicitly:

  forward:  ONE variadic reduce over x (sum, sum of squares, f32 accum)
            + one elementwise pass producing y (fuses into the consumer).
            The batch statistics for the running-average update come out of
            the same reduce — no extra pass.
  backward: ONE variadic reduce over (dy, x) producing sum(dy) and
            sum(dy * x) + one elementwise pass producing dx (fuses into
            the upstream dgrad conv chain).

Numerics: f32 statistics, biased variance, computed with a SHIFTED
single-pass reduction — ``var = E[(x-c)^2] - E[x-c]^2`` with the shift ``c``
taken as the RUNNING mean (already a variable: zero extra reduces, zero
extra passes, and the algebra is exact for ANY c). The naive
``E[x^2] - E[x]^2`` (which flax.linen.BatchNorm uses) cancels in f32 when a
channel's |mean| >> std; once training is underway the running mean tracks
the batch mean, so the cancellation ratio stays ~1 exactly where long runs
live. A data-dependent shift (per-batch sample-0 mean) was measured to cost
19% of the ResNet-50 step on v5e — the dependent pre-reduce splits XLA's
conv+reduce fusion — and was reverted in favour of this free one.
Equivalence with flax BN is tested in tests/test_fused_bn.py; train-mode
trajectory equality vs torch in tests/test_reference_train_parity.py.
Parity target: the reference's per-task ``nn.BatchNorm2d`` usage (e.g.
reference simpleAICV/classification/backbones/resnet.py:19-47
ConvBnActBlock). The running VARIANCE blends the UNBIASED batch variance
(torch ATen semantics, n/(n-1)) so reference-trained and repo-trained
checkpoints are eval-compatible.

The module below, :class:`FusedBatchNorm`, is variable-compatible with
``flax.linen.BatchNorm`` (same ``batch_stats``/``params`` collections and
names) so checkpoints are interchangeable.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bn_train(x, gamma, beta, shift, eps):
    """Train-mode BN of an NHWC tensor. Returns (y, mean, var).

    ``shift`` is a per-channel f32 constant for the numerically shifted
    statistics (the running mean; stop-gradient, non-differentiated).
    mean/var are the biased batch statistics (f32); their cotangents are
    ignored in the backward pass — they exist to feed the (stop-gradient)
    running-average update without a second reduce pass over x.
    """
    y, (mean, var, _) = _bn_train_fwd_impl(x, gamma, beta, shift, eps)
    return y, mean, var


# When True, the statistics reduces read a fusion-barriered copy of the
# tensor, forcing them into their own pass instead of XLA's conv+reduce
# fusion. Measured on v5e at b128: the barrier LOSES (0.88ms vs 0.64ms at
# 56x56 64->256; 0.47 vs 0.34 at 28x28 128->512) because the barrier
# materializes an extra copy of the conv output. Default off; kept as a
# measurement knob.
_STATS_BARRIER = False


def set_stats_barrier(enabled: bool):
    global _STATS_BARRIER
    _STATS_BARRIER = enabled


def _bn_train_fwd_impl(x, gamma, beta, shift, eps):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xr = jax.lax.optimization_barrier(x) if _STATS_BARRIER else x
    xf = xr.astype(jnp.float32)
    # one variadic reduce pass: both shifted sums in a single read of x
    # (the x - shift subtract fuses into the reduce; shift is a variable,
    # not a reduce result, so the conv+reduce fusion stays intact)
    c = jax.lax.stop_gradient(shift.astype(jnp.float32))
    xs = xf - c
    s1 = jnp.sum(xs, axis=(0, 1, 2))
    s2 = jnp.sum(jnp.square(xs), axis=(0, 1, 2))
    d = s1 / n
    mean = c + d
    var = s2 / n - jnp.square(d)
    rstd = jax.lax.rsqrt(var + eps)
    # elementwise pass in x.dtype (bf16 stays on the full-rate VPU path — an
    # f32 upcast here measured a 19% ResNet-50 step regression). Centred on
    # (x - mean): the expanded x*scale + shift form cancels in f32 when
    # |mean| >> std (same hazard as the variance above); in bf16 the centred
    # subtract is as accurate as the representation allows.
    scale = (gamma * rstd).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * scale + beta.astype(x.dtype)
    return y, (mean, var, rstd)


def _bn_train_vjp_fwd(x, gamma, beta, shift, eps):
    y, (mean, var, rstd) = _bn_train_fwd_impl(x, gamma, beta, shift, eps)
    return (y, mean, var), (x, gamma, mean, rstd)


def _bn_train_vjp_bwd(eps, res, cts):
    dy = cts[0]  # mean/var cotangents are zero (stat update path only)
    x, gamma, mean, rstd = res
    n = x.shape[0] * x.shape[1] * x.shape[2]
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if _STATS_BARRIER:  # same producer-fusion hazard as the forward stats
        dyr, xr = jax.lax.optimization_barrier((dy, x))
        dyrf, xrf = dyr.astype(jnp.float32), xr.astype(jnp.float32)
    else:
        dyrf, xrf = dyf, xf
    # one variadic reduce pass over (dy, x): both backward sums together.
    # sum(dy * xhat) is accumulated as sum(dy * (x - mean)) directly — the
    # subtract fuses into the reduce, nothing is materialized, and it avoids
    # the f32 cancellation of the algebraic form sum(dy*x) - mean*sum(dy)
    # (same hazard as the forward's shifted variance; see module docstring)
    s_dy = jnp.sum(dyrf, axis=(0, 1, 2))
    s_dyxc = jnp.sum(dyrf * (xrf - mean), axis=(0, 1, 2))
    s_dyxhat = rstd * s_dyxc
    # one elementwise pass over (dy, x) -> dx (bf16 out); centred on
    # (x - mean) rather than expanded into x*b + const — the expanded form
    # cancels in f32 when |mean| >> std, same hazard as above
    a = gamma * rstd
    k = a * (rstd / n) * s_dyxhat          # coefficient of (x - mean)
    dx = (dyf * a - (xf - mean) * k - a * (s_dy / n)).astype(x.dtype)
    # shift (the running mean) is stop-gradient by construction
    return dx, s_dyxhat, s_dy, jnp.zeros_like(mean)


bn_train.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in for flax.linen.BatchNorm (NHWC) with the minimal-pass VJP.

    Variable layout matches nn.BatchNorm: params {scale, bias},
    batch_stats {mean, var}. Only the axis=-1 NHWC/NLC case is supported —
    that is the only case the model zoo uses.
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None          # accepted for signature parity; unused
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        if use_ra:
            # centred form, matching the train path: the expanded
            # x*s + (bias - scale*rstd*mean) folding cancels catastrophically
            # when |mean| >> std — the exact f32 hazard the train-mode
            # statistics were rewritten to avoid (ROADMAP round-4). Keeping
            # eval centred keeps train/eval numerics consistent on
            # large-mean channels at zero extra passes (one fused
            # subtract-multiply-add).
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            xc = x.astype(jnp.float32) - ra_mean.value
            return (xc * (scale * rstd) + bias).astype(x.dtype)

        orig_shape = x.shape
        if x.ndim != 4:  # NLC and other ranks -> flatten to NHWC-like
            x = x.reshape((x.shape[0], 1, -1, features))
        y, mean, var = bn_train(x, scale, bias, ra_mean.value,
                                self.epsilon)
        y = y.reshape(orig_shape)
        if not self.is_initializing():
            # same stop-gradient semantics as flax: stats are plain
            # variables, never differentiated. The running VAR blends the
            # UNBIASED batch variance (n/(n-1)) — torch BatchNorm semantics
            # (ATen batch_norm updates running_var with the unbiased
            # estimate), so reference-trained checkpoints and repo-trained
            # ones are bit-compatible in eval. flax.linen.BatchNorm blends
            # the biased one; the difference reaches 3.2% at a 2x2 spatial
            # (n=32) and was caught by tests/test_reference_train_parity.py.
            n_stat = x.size // x.shape[-1]
            m = self.momentum
            ra_mean.value = (m * ra_mean.value
                             + (1 - m) * jax.lax.stop_gradient(mean))
            ra_var.value = (m * ra_var.value
                            + (1 - m) * (n_stat / max(n_stat - 1, 1))
                            * jax.lax.stop_gradient(var))
        return y
