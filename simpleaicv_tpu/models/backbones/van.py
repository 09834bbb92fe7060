"""VAN (Visual Attention Network, large-kernel-attention) — parity: reference
simpleAICV/classification/backbones/van.py:20-370 (4 stages of overlap patch
embed + LKA blocks with layer-scale; variants b0-b6).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import DropPath, cdtype

__all__ = ["VAN", "van_b0", "van_b1", "van_b2", "van_b3", "van_b4", "van_b5",
           "van_b6"]


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _conv(planes, k, stride=1, pad=0, groups=1, dilation=1, name=None):
    return nn.Conv(planes, (k, k), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   feature_group_count=groups,
                   kernel_dilation=(dilation, dilation), use_bias=True,
                   dtype=cdtype(), param_dtype=jnp.float32, name=name)


class LKA(nn.Module):
    """Large-kernel attention: 5x5 dw + 7x7 dw dilated-3 + 1x1, gated."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        attn = _conv(c, 5, pad=2, groups=c, name="conv0")(x)
        attn = _conv(c, 7, pad=9, groups=c, dilation=3,
                     name="conv_spatial")(attn)
        attn = _conv(c, 1, name="conv1")(attn)
        return x * attn


class VANAttention(nn.Module):

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        shortcut = x
        x = _conv(c, 1, name="proj_1")(x)
        x = nn.relu(x)
        x = LKA(name="spatial_gating_unit")(x)
        x = _conv(c, 1, name="proj_2")(x)
        return x + shortcut


class VANMlp(nn.Module):
    hidden: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = _conv(self.hidden, 1, name="fc1")(x)
        x = _conv(self.hidden, 3, pad=1, groups=self.hidden, name="dwconv")(x)
        x = nn.relu(x)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = _conv(c, 1, name="fc2")(x)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x


class VANBlock(nn.Module):
    mlp_ratio: int = 4
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-5), (c,), jnp.float32)
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-5), (c,), jnp.float32)
        h = _bn(train, "norm1")(x).astype(cdtype())
        h = VANAttention(name="attn")(h)
        x = x + DropPath(self.drop_path_prob)((ls1 * h).astype(x.dtype), train)
        h = _bn(train, "norm2")(x).astype(cdtype())
        h = VANMlp(int(c * self.mlp_ratio), self.dropout_prob,
                   name="mlp")(h, train)
        x = x + DropPath(self.drop_path_prob)((ls2 * h).astype(x.dtype), train)
        return x


class OverlapPatchEmbed(nn.Module):
    planes: int
    patch_size: int = 7
    stride: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.patch_size // 2
        x = _conv(self.planes, self.patch_size, self.stride, pad,
                  name="proj")(x)
        x = _bn(train, "norm")(x).astype(cdtype())
        return x


class VAN(nn.Module):
    embedding_planes: Sequence[int] = (64, 128, 256, 512)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    block_nums: Sequence[int] = (3, 4, 6, 3)
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    features_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.block_nums)
        dpp = [self.drop_path_prob * i / max(total - 1, 1) for i in range(total)]

        block_cls = VANBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        features = []
        idx = 0
        for i, (planes, ratio, n) in enumerate(
                zip(self.embedding_planes, self.mlp_ratios, self.block_nums)):
            if i == 0:
                x = OverlapPatchEmbed(planes, 7, 4,
                                      name=f"patch_embed{i + 1}")(x, train)
            else:
                x = OverlapPatchEmbed(planes, 3, 2,
                                      name=f"patch_embed{i + 1}")(x, train)
            for j in range(n):
                x = block_cls(ratio, self.dropout_prob, dpp[idx],
                              name=f"block{i + 1}_{j}")(x, train)
                idx += 1
            x = _bn(train, f"norm{i + 1}")(x).astype(cdtype())
            features.append(x)

        if self.features_only:
            return tuple(features)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="head")(x)
        return x


def _van(embedding_planes, mlp_ratios, block_nums, **kwargs):
    return VAN(embedding_planes=embedding_planes, mlp_ratios=mlp_ratios,
               block_nums=block_nums, **kwargs)


@BACKBONES.register()
def van_b0(**kwargs):
    return _van((32, 64, 160, 256), (8, 8, 4, 4), (3, 3, 5, 2), **kwargs)


@BACKBONES.register()
def van_b1(**kwargs):
    return _van((64, 128, 320, 512), (8, 8, 4, 4), (2, 2, 4, 2), **kwargs)


@BACKBONES.register()
def van_b2(**kwargs):
    return _van((64, 128, 320, 512), (8, 8, 4, 4), (3, 3, 12, 3), **kwargs)


@BACKBONES.register()
def van_b3(**kwargs):
    return _van((64, 128, 320, 512), (8, 8, 4, 4), (3, 5, 27, 3), **kwargs)


@BACKBONES.register()
def van_b4(**kwargs):
    return _van((64, 128, 320, 512), (8, 8, 4, 4), (3, 6, 40, 3), **kwargs)


@BACKBONES.register()
def van_b5(**kwargs):
    return _van((96, 192, 480, 768), (8, 8, 4, 4), (3, 3, 24, 3), **kwargs)


@BACKBONES.register()
def van_b6(**kwargs):
    return _van((96, 192, 384, 768), (8, 8, 4, 4), (6, 6, 90, 6), **kwargs)
