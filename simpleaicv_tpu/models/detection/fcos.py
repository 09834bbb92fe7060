"""FCOS (parity: reference simpleAICV/detection/models/fcos.py:27-120 —
backbone C3-C5 + RetinaFPN(use_p5=True) + shared GN tower head, per-level
learnable reg scale applied as ``reg * exp(scale)``)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES, MODELS
from .fpn import RetinaFPN
from .head import FCOSClsRegCntHead

__all__ = ["FCOS", "resnet18_fcos", "resnet34_fcos", "resnet50_fcos",
           "resnet101_fcos", "resnet152_fcos", "convformer_m36_fcos",
           "van_b2_fcos"]


class FCOS(nn.Module):
    backbone_type: str
    planes: int = 256
    num_classes: int = 80
    use_gn: bool = True
    cnt_on_reg: bool = True
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = RetinaFPN(planes=self.planes, use_p5=True)
        self.clsregcnt_head = FCOSClsRegCntHead(
            self.num_classes, use_gn=self.use_gn, cnt_on_reg=self.cnt_on_reg)

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = self.backbone(x, train)[-3:]
        features = self.fpn(features, train)
        scales = self.param("scales", nn.initializers.ones, (len(features),),
                            jnp.float32)
        cls_heads, reg_heads, center_heads = [], [], []
        for i, f in enumerate(features):
            cls, reg, cnt = self.clsregcnt_head(f)
            reg = reg.astype(jnp.float32) * jnp.exp(scales[i])
            cls_heads.append(cls)
            reg_heads.append(reg)
            center_heads.append(cnt)
        return [cls_heads, reg_heads, center_heads]


def _fcos(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return FCOS(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_fcos(**kwargs):
    return _fcos("resnet18", **kwargs)


@MODELS.register()
def resnet34_fcos(**kwargs):
    return _fcos("resnet34", **kwargs)


@MODELS.register()
def resnet50_fcos(**kwargs):
    return _fcos("resnet50", **kwargs)


@MODELS.register()
def resnet101_fcos(**kwargs):
    return _fcos("resnet101", **kwargs)


@MODELS.register()
def resnet152_fcos(**kwargs):
    return _fcos("resnet152", **kwargs)


@MODELS.register()
def convformer_m36_fcos(**kwargs):
    return _fcos("convformer_m36", **kwargs)


@MODELS.register()
def van_b2_fcos(**kwargs):
    return _fcos("van_b2", **kwargs)
