"""Shared model building blocks (flax.linen, NHWC, bf16-compute / f32-params).

TPU-first conventions used across the whole model zoo:
  * NHWC layout (XLA TPU's native conv layout — avoids transposes);
  * ``dtype`` = compute dtype (default bfloat16: feeds the MXU at full rate),
    ``param_dtype`` = float32 master weights;
  * BatchNorm stats always f32; under the SPMD engine, batch stats are computed
    over the *global* sharded batch, so cross-replica SyncBN (reference
    tools/utils.py:168-169) is the default behaviour, for free;
  * gradient checkpointing via ``nn.remat`` mirrors the reference's
    ``use_gradient_checkpoint`` flag (reference
    simpleAICV/classification/backbones/resnet.py:230-235).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Global compute dtype for the model zoo. bf16 by default (MXU full rate);
# the reference-parity tests flip it to f32 (set_compute_dtype) so flax
# outputs can be compared to the reference's torch-f32 models at tight
# tolerance. Resolved at *trace/instantiation* time: module dtype fields use
# ``dtype_field()`` (a dataclasses default_factory) and call-time literals use
# ``cdtype()``, so a set_compute_dtype() before init/apply takes effect
# everywhere without threading a dtype argument through every model.
_COMPUTE_DTYPE = jnp.bfloat16


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def cdtype():
    """The current global compute dtype (call-time resolution)."""
    return _COMPUTE_DTYPE


def acc_dtype():
    """High-precision accumulation dtype paired with the compute dtype.

    f32 when the compute dtype is any sub-32-bit dtype — 16-bit floats
    (bf16/f16: sigmoid / norm math stays out of the 8-bit mantissa) and,
    conservatively, fp8/int8/int16 should a config ever select one; the
    compute dtype itself otherwise, so the f32 parity mode compares
    like-for-like against the torch reference.
    """
    d = jnp.dtype(_COMPUTE_DTYPE)
    if d.itemsize <= 2:
        return jnp.float32
    return _COMPUTE_DTYPE


def dtype_field():
    """A flax Module field defaulting to the global compute dtype."""
    return dataclasses.field(default_factory=cdtype)

# BatchNorm compute dtype. Stats/params stay f32 either way (param_dtype);
# bf16 normalization math keeps the whole residual path on the MXU/VPU fast
# path. Flip with set_bn_compute_dtype() before model construction.
_BN_COMPUTE_DTYPE = jnp.float32

# When True, an optimization_barrier is inserted between each conv and its
# BatchNorm so XLA emits the conv as a pure MXU op and the BN statistics as a
# separate (bandwidth-rate) reduce pass, instead of one conv+reduce fusion
# (measured ~2x slower than the two parts separately on v5e).
_BN_STATS_BARRIER = False

# When True (default), ConvBnAct uses the minimal-pass custom-VJP BatchNorm
# (ops/fused_bn.py) instead of flax's autodiff-derived one. Same numerics
# and variable layout; fewer HBM passes in the backward.
_BN_FUSED = True


def set_bn_compute_dtype(dtype):
    global _BN_COMPUTE_DTYPE
    _BN_COMPUTE_DTYPE = dtype


def set_bn_stats_barrier(enabled: bool):
    global _BN_STATS_BARRIER
    _BN_STATS_BARRIER = enabled


def set_bn_fused(enabled: bool):
    global _BN_FUSED
    _BN_FUSED = enabled


class ConvBnAct(nn.Module):
    """conv -> (bn) -> (act); parity with the reference's ConvBnActBlock
    (simpleAICV/classification/backbones/resnet.py:19-47)."""
    planes: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = None  # None -> SAME-style explicit pad of (k-1)//2
    groups: int = 1
    has_bn: bool = True
    has_act: bool = True
    act: Callable = nn.relu
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # int or (h, w) tuples for kernel/stride/padding (the reference's OCR
        # backbone uses (3,1)/(2,1)/(1,0) stages)
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size, self.kernel_size)
        s = self.stride if isinstance(self.stride, (tuple, list)) \
            else (self.stride, self.stride)
        if self.padding is None:
            pad = ((k[0] - 1) // 2, (k[1] - 1) // 2)
        elif isinstance(self.padding, (tuple, list)):
            pad = tuple(self.padding)
        else:
            pad = (self.padding, self.padding)
        x = nn.Conv(self.planes, tuple(k),
                    strides=tuple(s),
                    padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                    feature_group_count=self.groups,
                    use_bias=not self.has_bn,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        if self.has_bn:
            if _BN_STATS_BARRIER:
                x = jax.lax.optimization_barrier(x)
            if _BN_FUSED:
                from ..ops.fused_bn import FusedBatchNorm
                x = FusedBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   name="bn")(x)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=_BN_COMPUTE_DTYPE,
                                 param_dtype=jnp.float32, name="bn")(x)
            x = x.astype(self.dtype)
        if self.has_act:
            x = self.act(x)
        return x


def global_avg_pool(x):
    """NHWC global average pool -> [N, C]."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def max_pool_same(x, window: int, stride: int):
    pad = (window - 1) // 2
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)])


class DropPath(nn.Module):
    """Stochastic depth (parity: reference DropPathBlock, vit.py:110-143)."""
    drop_path_prob: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.drop_path_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_path_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def maybe_remat(module_cls, use_gradient_checkpoint: bool, static_argnums=(2,)):
    """Return module_cls or its rematerialised version (jax.checkpoint).

    ``static_argnums`` defaults to the conventional ``(x, train)`` call
    signature where ``train`` (argnum 2, counting self) is static.
    """
    if use_gradient_checkpoint:
        return nn.remat(module_cls, static_argnums=static_argnums)
    return module_cls


def truncated_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev)
