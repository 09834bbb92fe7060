"""DeepLabV3+ (parity: reference
simpleAICV/semantic_segmentation/models/deeplabv3plus.py:95-429 — per-stage
ASPP heads on C1-C4, fused at C1 resolution, bilinear-upsampled logits)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from ..common import cdtype

from ...core.registry import BACKBONES, MODELS
from ..detection.fpn import _upsample_to

__all__ = ["DeepLabV3Plus", "resnet18_deeplabv3plus", "resnet34_deeplabv3plus",
           "resnet50_deeplabv3plus", "resnet101_deeplabv3plus",
           "resnet152_deeplabv3plus", "vanb2_deeplabv3plus",
           "convformerm36_deeplabv3plus"]


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class ConvBnAct(nn.Module):
    planes: int
    kernel_size: int = 1
    dilation: int = 1
    depthwise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        groups = x.shape[-1] if self.depthwise else 1
        planes = x.shape[-1] if self.depthwise else self.planes
        x = nn.Conv(planes, (k, k), padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=groups, use_bias=False,
                    dtype=cdtype(), param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(cdtype()))


class LightConv(nn.Module):
    """Depthwise kxk dilated + pointwise 1x1 (reference LightConvBlock)."""
    planes: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(x.shape[-1], self.kernel_size, self.dilation,
                      depthwise=True, name="dw")(x, train)
        x = ConvBnAct(self.planes, 1, name="pw")(x, train)
        return x


class ASPPBlock(nn.Module):
    planes: int = 256
    output_stride: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        pool = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pool = ConvBnAct(self.planes, 1, name="pooling_conv")(
            pool.astype(cdtype()), train)
        pool = jnp.broadcast_to(pool, (x.shape[0], x.shape[1], x.shape[2],
                                       self.planes))
        x0 = ConvBnAct(self.planes, 1, name="aspp0")(x, train)
        x1 = LightConv(self.planes, 3, d[0], name="aspp1")(x, train)
        x2 = LightConv(self.planes, 3, d[1], name="aspp2")(x, train)
        x3 = LightConv(self.planes, 3, d[2], name="aspp3")(x, train)
        x = jnp.concatenate([pool, x0, x1, x2, x3], axis=-1)
        return ConvBnAct(self.planes, 1, name="fuse_conv")(x, train)


class DeepLabV3PlusHead(nn.Module):
    planes: int = 256
    output_stride: int = 8
    num_classes: int = 150

    @nn.compact
    def __call__(self, features, train: bool = False):
        c1, c2, c3, c4 = features
        h, w = c1.shape[1], c1.shape[2]
        outs = []
        for i, c in enumerate([c1, c2, c3, c4]):
            a = ASPPBlock(self.planes, self.output_stride,
                          name=f"aspp{i + 1}")(c, train)
            if i > 0:
                a = _upsample_to(a, h, w)
            outs.append(a)
        x = jnp.concatenate(outs, axis=-1)
        x = LightConv(self.planes, 3, 1, name="fuse_conv_0")(x, train)
        x = LightConv(self.planes, 3, 1, name="fuse_conv_1")(x, train)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name="predict_conv")(x.astype(jnp.float32))
        return x


class DeepLabV3Plus(nn.Module):
    backbone_type: str
    planes: int = 256
    output_stride: int = 8
    num_classes: int = 150
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.head = DeepLabV3PlusHead(planes=self.planes,
                                      output_stride=self.output_stride,
                                      num_classes=self.num_classes)

    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        features = self.backbone(x, train)
        logits = self.head(features, train)
        return _upsample_to(logits, h, w)


def _deeplab(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return DeepLabV3Plus(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_deeplabv3plus(**kwargs):
    return _deeplab("resnet18", **kwargs)


@MODELS.register()
def resnet34_deeplabv3plus(**kwargs):
    return _deeplab("resnet34", **kwargs)


@MODELS.register()
def resnet50_deeplabv3plus(**kwargs):
    return _deeplab("resnet50", **kwargs)


@MODELS.register()
def resnet101_deeplabv3plus(**kwargs):
    return _deeplab("resnet101", **kwargs)


@MODELS.register()
def resnet152_deeplabv3plus(**kwargs):
    return _deeplab("resnet152", **kwargs)


@MODELS.register()
def vanb2_deeplabv3plus(**kwargs):
    return _deeplab("van_b2", **kwargs)


@MODELS.register()
def convformerm36_deeplabv3plus(**kwargs):
    return _deeplab("convformer_m36", **kwargs)
