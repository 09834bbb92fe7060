"""DarkNet tiny/19/53 — parity: reference
simpleAICV/classification/backbones/darknet.py:147-453.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import ConvBnAct, global_avg_pool

__all__ = ["DarknetTiny", "Darknet19", "Darknet53", "darknettiny",
           "darknet19", "darknet53"]


def _act(act_type):
    if act_type == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    return nn.relu


class Darknet19Block(nn.Module):
    planes: int
    layer_num: int
    use_maxpool: bool = False
    act_type: str = "leakyrelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        act = _act(self.act_type)
        for i in range(self.layer_num):
            if i % 2 == 0:
                x = ConvBnAct(self.planes, 3, 1, act=act,
                              name=f"conv{i}")(x, train)
            else:
                x = ConvBnAct(inplanes, 1, 1, act=act,
                              name=f"conv{i}")(x, train)
        if self.use_maxpool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class Darknet53Block(nn.Module):
    act_type: str = "leakyrelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        act = _act(self.act_type)
        h = ConvBnAct(c // 2, 1, 1, act=act, name="conv1")(x, train)
        h = ConvBnAct(c, 3, 1, act=act, name="conv2")(h, train)
        return h + x


class DarknetTiny(nn.Module):
    act_type: str = "leakyrelu"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.act_type)
        for i, planes in enumerate([16, 32, 64, 128, 256]):
            x = ConvBnAct(planes, 3, 1, act=act, name=f"conv{i + 1}")(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBnAct(512, 3, 1, act=act, name="conv6")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


class Darknet19(nn.Module):
    act_type: str = "leakyrelu"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.act_type)
        x = ConvBnAct(32, 3, 1, act=act, name="layer1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Darknet19Block(64, 1, True, self.act_type, name="layer2")(x, train)
        x = Darknet19Block(128, 3, True, self.act_type, name="layer3")(x, train)
        x = Darknet19Block(256, 3, True, self.act_type, name="layer4")(x, train)
        x = Darknet19Block(512, 5, True, self.act_type, name="layer5")(x, train)
        x = Darknet19Block(1024, 5, False, self.act_type,
                           name="layer6")(x, train)
        x = ConvBnAct(self.num_classes, 1, 1, has_bn=False, has_act=False,
                      name="layer7")(x, train)
        x = global_avg_pool(x)
        return x


class Darknet53(nn.Module):
    act_type: str = "leakyrelu"
    num_classes: int = 1000
    features_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.act_type)
        x = ConvBnAct(32, 3, 1, act=act, name="conv1")(x, train)
        x = ConvBnAct(64, 3, 2, act=act, name="conv2")(x, train)
        features = []
        for stage, (planes, n_blocks) in enumerate(
                zip([64, 128, 256, 512, 1024], [1, 2, 8, 8, 4])):
            if stage > 0:
                x = ConvBnAct(planes, 3, 2, act=act,
                              name=f"conv{stage + 2}")(x, train)
            for j in range(n_blocks):
                x = Darknet53Block(self.act_type,
                                   name=f"block{stage + 1}_{j}")(x, train)
            features.append(x)

        if self.features_only:
            return tuple(features[-3:])  # C3, C4, C5

        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


@BACKBONES.register()
def darknettiny(**kwargs):
    return DarknetTiny(**kwargs)


@BACKBONES.register()
def darknet19(**kwargs):
    return Darknet19(**kwargs)


@BACKBONES.register()
def darknet53(**kwargs):
    return Darknet53(**kwargs)
