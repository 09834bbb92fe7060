"""ResNet-for-CIFAR (3x3/1 stem, no maxpool) — parity with reference
simpleAICV/classification/backbones/resnetforcifar.py:27-127.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import ConvBnAct, global_avg_pool, maybe_remat
from .resnet import BasicBlock, Bottleneck

__all__ = ["ResNetCifar", "resnet18cifar", "resnet34cifar", "resnet50cifar",
           "resnet101cifar", "resnet152cifar"]


class ResNetCifar(nn.Module):
    block: Type[nn.Module]
    layer_nums: Sequence[int]
    inplanes: int = 64
    num_classes: int = 100
    use_gradient_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = maybe_remat(self.block, self.use_gradient_checkpoint)

        x = ConvBnAct(self.inplanes, 3, 1, name="stem")(x, train)

        planes = self.inplanes
        for stage_idx, n in enumerate(self.layer_nums):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n):
                x = block_cls(planes, stride if block_idx == 0 else 1,
                              name=f"layer{stage_idx + 1}_{block_idx}")(x, train)
            planes *= 2

        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


def _resnetcifar(block, layers, inplanes, **kwargs):
    return ResNetCifar(block=block, layer_nums=layers, inplanes=inplanes,
                       **kwargs)


@BACKBONES.register()
def resnet18cifar(**kwargs):
    return _resnetcifar(BasicBlock, [2, 2, 2, 2], 64, **kwargs)


@BACKBONES.register()
def resnet34cifar(**kwargs):
    return _resnetcifar(BasicBlock, [3, 4, 6, 3], 64, **kwargs)


@BACKBONES.register()
def resnet50cifar(**kwargs):
    return _resnetcifar(Bottleneck, [3, 4, 6, 3], 64, **kwargs)


@BACKBONES.register()
def resnet101cifar(**kwargs):
    return _resnetcifar(Bottleneck, [3, 4, 23, 3], 64, **kwargs)


@BACKBONES.register()
def resnet152cifar(**kwargs):
    return _resnetcifar(Bottleneck, [3, 8, 36, 3], 64, **kwargs)
