"""DBNet text detection (parity: reference
simpleAICV/text_detection/models/dbnet.py:36 + fpn.py:48 (C2-C5 -> concat
inter/4 features at C2 res) + head.py:77 (probability/threshold maps via two
stride-2 transposed convs)). Output: [B,H,W,2] (prob, thresh) at input res."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES, MODELS
from .common import ConvBnAct, cdtype
from .detection.fpn import _upsample_to

__all__ = ["DBNet", "resnet18_dbnet", "resnet34_dbnet", "resnet50_dbnet",
           "vanb2_dbnet", "convformerm36_dbnet"]


class DBNetFPN(nn.Module):
    inter_planes: int = 256

    @nn.compact
    def __call__(self, features, train: bool = False):
        c2, c3, c4, c5 = features
        q = self.inter_planes // 4
        p5 = ConvBnAct(q, 1, name="c5_conv")(c5, train)
        p4 = ConvBnAct(q, 1, name="c4_conv")(c4, train)
        p4 = _upsample_to(p5, p4.shape[1], p4.shape[2]) + p4
        p4 = ConvBnAct(q, 3, name="p4_conv")(p4, train)
        p3 = ConvBnAct(q, 1, name="c3_conv")(c3, train)
        p3 = _upsample_to(p4, p3.shape[1], p3.shape[2]) + p3
        p3 = ConvBnAct(q, 3, name="p3_conv")(p3, train)
        p2 = ConvBnAct(q, 1, name="c2_conv")(c2, train)
        p2 = _upsample_to(p3, p2.shape[1], p2.shape[2]) + p2
        p2 = ConvBnAct(q, 3, name="p2_conv")(p2, train)

        h, w = p2.shape[1], p2.shape[2]
        fused = jnp.concatenate([
            p2,
            _upsample_to(p3, h, w),
            _upsample_to(p4, h, w),
            _upsample_to(p5, h, w),
        ], axis=-1)
        return ConvBnAct(self.inter_planes, 3, name="last_conv")(fused, train)


class _UpHead(nn.Module):
    """3x3 conv -> convT/2 -> convT/2 to 1 channel + sigmoid."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = x.shape[-1] // 4
        x = ConvBnAct(q, 3, name="conv")(x, train)
        x = nn.ConvTranspose(q, (2, 2), strides=(2, 2), use_bias=False,
                             dtype=cdtype(), param_dtype=jnp.float32,
                             name="convt1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x.astype(cdtype()))
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), use_bias=True,
                             dtype=jnp.float32, param_dtype=jnp.float32,
                             name="convt2")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class DBNetHead(nn.Module):
    k: int = 50

    @nn.compact
    def __call__(self, x, train: bool = False):
        prob = _UpHead(name="binary_conv")(x, train)
        thresh = _UpHead(name="thresh_conv")(x, train)
        return jnp.concatenate([prob, thresh], axis=-1)


class DBNet(nn.Module):
    backbone_type: str
    inter_planes: int = 256
    k: int = 50
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = DBNetFPN(inter_planes=self.inter_planes)
        self.head = DBNetHead(k=self.k)

    def __call__(self, x, train: bool = False):
        features = self.backbone(x, train)
        return self.head(self.fpn(features, train), train)


def _dbnet(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return DBNet(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_dbnet(**kwargs):
    return _dbnet("resnet18", **kwargs)


@MODELS.register()
def resnet34_dbnet(**kwargs):
    return _dbnet("resnet34", **kwargs)


@MODELS.register()
def resnet50_dbnet(**kwargs):
    return _dbnet("resnet50", **kwargs)


@MODELS.register()
def vanb2_dbnet(**kwargs):
    return _dbnet("van_b2", **kwargs)


@MODELS.register()
def convformerm36_dbnet(**kwargs):
    return _dbnet("convformer_m36", **kwargs)
