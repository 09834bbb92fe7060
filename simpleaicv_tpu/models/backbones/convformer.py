"""ConvFormer (MetaFormer with SepConv token mixer) — parity: reference
simpleAICV/classification/backbones/convformer.py:16-298 (4-stage, BN norms,
downsampling 7x7/4 then 3x3/2; variants s18/s36/m36/b36).

TPU-first: the reference permutes NCHW<->NHWC around every pointwise linear;
here everything is natively NHWC so the blocks are pure conv/matmul chains XLA
can fuse.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import DropPath, cdtype

__all__ = ["MetaFormer", "convformer_s18", "convformer_s36", "convformer_m36",
           "convformer_b36"]


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class Downsampling(nn.Module):
    planes: int
    kernel_size: int
    stride: int
    padding: int
    pre_norm: bool = False
    post_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pre_norm:
            x = _bn(train, "pre_norm")(x).astype(cdtype())
        p = self.padding
        x = nn.Conv(self.planes, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=True,
                    dtype=cdtype(), param_dtype=jnp.float32,
                    name="conv")(x)
        if self.post_norm:
            x = _bn(train, "post_norm")(x).astype(cdtype())
        return x


class SepConv(nn.Module):
    kernel_size: int = 7
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = int(self.expand_ratio * c)
        x = nn.Dense(mid, use_bias=False, dtype=cdtype(),
                     param_dtype=jnp.float32, name="pwconv1")(x)
        x = nn.relu(x)
        k = self.kernel_size
        pad = (k - 1) // 2
        x = nn.Conv(mid, (k, k), padding=[(pad, pad), (pad, pad)],
                    feature_group_count=mid, use_bias=False,
                    dtype=cdtype(), param_dtype=jnp.float32,
                    name="dwconv")(x)
        x = nn.Dense(c, use_bias=False, dtype=cdtype(),
                     param_dtype=jnp.float32, name="pwconv2")(x)
        return x


class Mlp(nn.Module):
    mlp_ratio: int = 4
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Dense(int(self.mlp_ratio * c), use_bias=False,
                     dtype=cdtype(), param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.relu(x)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = nn.Dense(c, use_bias=False, dtype=cdtype(),
                     param_dtype=jnp.float32, name="fc2")(x)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x


class MetaFormerBlock(nn.Module):
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _bn(train, "norm1")(x).astype(cdtype())
        h = SepConv(name="token_mixer")(h)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        h = _bn(train, "norm2")(x).astype(cdtype())
        h = Mlp(dropout_prob=self.dropout_prob, name="mlp")(h, train)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        return x


class MetaFormer(nn.Module):
    embedding_planes: Sequence[int] = (64, 128, 320, 512)
    block_nums: Sequence[int] = (2, 2, 6, 2)
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    features_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.block_nums)
        dpp = [self.drop_path_prob * i / max(total - 1, 1) for i in range(total)]

        block_cls = MetaFormerBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        features = []
        idx = 0
        for i, (planes, n) in enumerate(
                zip(self.embedding_planes, self.block_nums)):
            if i == 0:
                x = Downsampling(planes, 7, 4, 2, post_norm=True,
                                 name=f"downsample_layers_{i}")(x, train)
            else:
                x = Downsampling(planes, 3, 2, 1, pre_norm=True,
                                 name=f"downsample_layers_{i}")(x, train)
            for j in range(n):
                x = block_cls(self.dropout_prob, dpp[idx],
                              name=f"stages_{i}_{j}")(x, train)
                idx += 1
            features.append(x)

        if self.features_only:
            return tuple(features)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="head")(x)
        return x


def _metaformer(block_nums, embedding_planes, **kwargs):
    return MetaFormer(block_nums=block_nums,
                      embedding_planes=embedding_planes, **kwargs)


@BACKBONES.register()
def convformer_s18(**kwargs):
    return _metaformer((3, 3, 9, 3), (64, 128, 320, 512), **kwargs)


@BACKBONES.register()
def convformer_s36(**kwargs):
    return _metaformer((3, 12, 18, 3), (64, 128, 320, 512), **kwargs)


@BACKBONES.register()
def convformer_m36(**kwargs):
    return _metaformer((3, 12, 18, 3), (96, 192, 384, 576), **kwargs)


@BACKBONES.register()
def convformer_b36(**kwargs):
    return _metaformer((3, 12, 18, 3), (128, 256, 512, 768), **kwargs)
