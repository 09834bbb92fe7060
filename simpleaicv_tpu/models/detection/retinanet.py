"""RetinaNet (parity: reference
simpleAICV/detection/models/retinanet.py:27-140 — backbone C3-C5 + RetinaFPN +
shared cls/reg towers, outputs per-level [B,H,W,A,C]/[B,H,W,A,4])."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES, MODELS
from .fpn import RetinaFPN
from .head import RetinaClsHead, RetinaRegHead

__all__ = ["RetinaNet", "resnet18_retinanet", "resnet34_retinanet",
           "resnet50_retinanet", "resnet101_retinanet", "resnet152_retinanet"]


class RetinaNet(nn.Module):
    backbone_type: str
    planes: int = 256
    num_anchors: int = 9
    num_classes: int = 80
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = RetinaFPN(planes=self.planes)
        self.cls_head = RetinaClsHead(self.num_anchors, self.num_classes)
        self.reg_head = RetinaRegHead(self.num_anchors)

    def __call__(self, x, train: bool = False):
        features = self.backbone(x, train)[-3:]  # C3, C4, C5
        features = self.fpn(features, train)
        cls_heads, reg_heads = [], []
        for f in features:
            b, h, w, _ = f.shape
            cls = self.cls_head(f).reshape(b, h, w, self.num_anchors,
                                           self.num_classes)
            reg = self.reg_head(f).reshape(b, h, w, self.num_anchors, 4)
            cls_heads.append(cls)
            reg_heads.append(reg)
        return [cls_heads, reg_heads]


def _retinanet(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return RetinaNet(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_retinanet(**kwargs):
    return _retinanet("resnet18", **kwargs)


@MODELS.register()
def resnet34_retinanet(**kwargs):
    return _retinanet("resnet34", **kwargs)


@MODELS.register()
def resnet50_retinanet(**kwargs):
    return _retinanet("resnet50", **kwargs)


@MODELS.register()
def resnet101_retinanet(**kwargs):
    return _retinanet("resnet101", **kwargs)


@MODELS.register()
def resnet152_retinanet(**kwargs):
    return _retinanet("resnet152", **kwargs)
