"""ResNet-18/34/50/101/152 (flax.linen, NHWC, bf16 compute).

Capability parity with reference
simpleAICV/classification/backbones/resnet.py:158-271 (stem 7x7/2 + maxpool,
BasicBlock/Bottleneck stages [64,128,256,512] with expansion 1/4, global avg
pool + fc). TPU-first: NHWC convs on the MXU, f32 BN, remat per block when
``use_gradient_checkpoint``.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import ConvBnAct, Dtype, dtype_field, global_avg_pool, max_pool_same, maybe_remat

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50", "resnet101",
           "resnet152"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        out = ConvBnAct(self.planes, 3, self.stride, name="conv1")(x, train)
        out = ConvBnAct(self.planes, 3, 1, has_act=False, name="conv2")(out, train)
        if self.stride != 1 or inplanes != self.planes:
            x = ConvBnAct(self.planes, 1, self.stride, has_act=False,
                          name="downsample")(x, train)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        outplanes = self.planes * self.expansion
        out = ConvBnAct(self.planes, 1, 1, name="conv1")(x, train)
        out = ConvBnAct(self.planes, 3, self.stride, name="conv2")(out, train)
        out = ConvBnAct(outplanes, 1, 1, has_act=False, name="conv3")(out, train)
        if self.stride != 1 or inplanes != outplanes:
            x = ConvBnAct(outplanes, 1, self.stride, has_act=False,
                          name="downsample")(x, train)
        return nn.relu(out + x)


class ResNet(nn.Module):
    block: Type[nn.Module]
    layer_nums: Sequence[int]
    inplanes: int = 64
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    # detection/segmentation backbones call with ``features_only=True`` to get
    # C2..C5 (reference per-task backbones/ copies return stage features)
    features_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = maybe_remat(self.block, self.use_gradient_checkpoint)
        expansion = 1 if self.block is BasicBlock else 4

        x = ConvBnAct(self.inplanes, 7, 2, name="stem")(x, train)
        x = max_pool_same(x, 3, 2)

        features = []
        planes = self.inplanes
        for stage_idx, n in enumerate(self.layer_nums):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n):
                x = block_cls(planes, stride if block_idx == 0 else 1,
                              name=f"layer{stage_idx + 1}_{block_idx}")(x, train)
            features.append(x)
            planes *= 2

        if self.features_only:
            return tuple(features)

        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


def _resnet(block, layers, inplanes, **kwargs):
    return ResNet(block=block, layer_nums=layers, inplanes=inplanes, **kwargs)


@BACKBONES.register()
def resnet18(**kwargs):
    return _resnet(BasicBlock, [2, 2, 2, 2], 64, **kwargs)


@BACKBONES.register()
def resnet34(**kwargs):
    return _resnet(BasicBlock, [3, 4, 6, 3], 64, **kwargs)


@BACKBONES.register()
def resnet50(**kwargs):
    return _resnet(Bottleneck, [3, 4, 6, 3], 64, **kwargs)


@BACKBONES.register()
def resnet101(**kwargs):
    return _resnet(Bottleneck, [3, 4, 23, 3], 64, **kwargs)


@BACKBONES.register()
def resnet152(**kwargs):
    return _resnet(Bottleneck, [3, 8, 36, 3], 64, **kwargs)
