"""YOLACT (parity: reference
simpleAICV/instance_segmentation/models/yolact.py:36-441 — C3-C5 FPN P3-P7,
ProtoNet (32 prototypes at C2 res), shared head predicting per-anchor class
(softmax, bg+classes), box regression and tanh mask coefficients, auxiliary
semantic-seg conv on P3)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from ..common import cdtype
import numpy as np

from ...core.registry import BACKBONES, MODELS
from ...ops.upsample import resize_bilinear

__all__ = ["YOLACT", "YOLACTAnchors", "resnet18_yolact", "resnet34_yolact",
           "resnet50_yolact", "resnet101_yolact", "resnet152_yolact",
           "vanb2_yolact", "convformerm36_yolact"]


class YOLACTAnchors:
    """Relative [cx, cy, w, h] anchors in [0,1] (reference
    simpleAICV/instance_segmentation/models/anchor.py:4-41 — YOLACT's
    SSD-style prior format; scales rescaled by resize/544)."""

    def __init__(self, resize=544, scales=(24, 48, 96, 192, 384),
                 ratios=(1, 0.5, 2), strides=(8, 16, 32, 64, 128)):
        self.resize = resize
        self.scales = resize / 544.0 * np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.strides = np.asarray(strides, np.float32)

    def flat_anchors(self, fpn_feature_sizes):
        """[sum(H*W*A), 4] relative cxcywh."""
        out = []
        for scale, fm in zip(self.scales, fpn_feature_sizes):
            w, h = int(fm[0]), int(fm[1])
            xs = (np.arange(w, dtype=np.float32) + 0.5) / w
            ys = (np.arange(h, dtype=np.float32) + 0.5) / h
            gx, gy = np.meshgrid(xs, ys)
            ctr = np.stack([gx, gy], axis=-1)[:, :, None, :]  # [h,w,1,2]
            ratio_sqrt = np.sqrt(self.ratios)
            ws = scale * ratio_sqrt / self.resize
            hs = scale / ratio_sqrt / self.resize
            wh = np.stack([ws, hs], axis=-1)[None, None]      # [1,1,A,2]
            anchors = np.concatenate(
                [np.broadcast_to(ctr, (h, w, len(self.ratios), 2)),
                 np.broadcast_to(wh, (h, w, len(self.ratios), 2))], axis=-1)
            out.append(anchors.reshape(-1, 4).astype(np.float32))
        return np.concatenate(out, axis=0)


def _conv(planes, k=3, name=None):
    pad = (k - 1) // 2
    return nn.Conv(planes, (k, k), padding=[(pad, pad), (pad, pad)],
                   use_bias=True, kernel_init=nn.initializers.normal(0.01),
                   dtype=cdtype(), param_dtype=jnp.float32, name=name)


class YOLACTFPN(nn.Module):
    """Exact port of the reference YOLACTFPN (yolact.py:36-139): 1x1 lat
    convs, bilinear align_corners=True top-down adds, per-level 3x3
    pred conv + ReLU, and P6/P7 as stride-2 3x3 conv + ReLU chains off
    the post-pred P5."""
    planes: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        p5 = _conv(self.planes, 1, name="lat_p5")(c5)
        p4 = _conv(self.planes, 1, name="lat_p4")(c4)
        p4 = resize_bilinear(p5, (p4.shape[1], p4.shape[2]),
                             align_corners=True).astype(p4.dtype) + p4
        p3 = _conv(self.planes, 1, name="lat_p3")(c3)
        p3 = resize_bilinear(p4, (p3.shape[1], p3.shape[2]),
                             align_corners=True).astype(p3.dtype) + p3

        p5 = nn.relu(_conv(self.planes, 3, name="pred_p5")(p5))
        p4 = nn.relu(_conv(self.planes, 3, name="pred_p4")(p4))
        p3 = nn.relu(_conv(self.planes, 3, name="pred_p3")(p3))

        p6 = nn.relu(nn.Conv(self.planes, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=cdtype(), param_dtype=jnp.float32,
                             name="down_p6")(p5))
        p7 = nn.relu(nn.Conv(self.planes, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=cdtype(), param_dtype=jnp.float32,
                             name="down_p7")(p6))
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    planes: int = 32

    @nn.compact
    def __call__(self, x, out_hw):
        c = x.shape[-1]
        for i in range(3):
            x = nn.relu(_conv(c, 3, name=f"proto1_{i}")(x))
        # reference ProtoNet: F.interpolate(bilinear, align_corners=True)
        # to the C2 resolution (yolact.py:248-253)
        x = resize_bilinear(x, (out_hw[0], out_hw[1]),
                            align_corners=True).astype(x.dtype)
        x = nn.relu(_conv(c, 3, name="proto2_0")(x))
        x = nn.relu(_conv(self.planes, 1, name="proto2_1")(x))
        return x.astype(jnp.float32)


class YOLACTHead(nn.Module):
    num_anchors: int = 3
    proto_planes: int = 32
    num_classes: int = 81

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.relu(_conv(c, 3, name="conv1")(x))
        conf = _conv(self.num_anchors * self.num_classes, 3,
                     name="conf_pred_conv")(x).astype(jnp.float32)
        box = _conv(self.num_anchors * 4, 3,
                    name="bbox_pred_conv")(x).astype(jnp.float32)
        coef = jnp.tanh(_conv(self.num_anchors * self.proto_planes, 3,
                              name="coef_pred_conv")(x).astype(jnp.float32))
        return conf, box, coef


class YOLACT(nn.Module):
    backbone_type: str
    fpn_planes: int = 256
    proto_planes: int = 32
    num_classes: int = 81  # includes background at index 0
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = YOLACTFPN(planes=self.fpn_planes)
        self.proto_net = ProtoNet(planes=self.proto_planes)
        self.head = YOLACTHead(num_anchors=3, proto_planes=self.proto_planes,
                               num_classes=self.num_classes)
        self.semantic_seg_conv = nn.Conv(
            self.num_classes - 1, (1, 1),
            kernel_init=nn.initializers.normal(0.01), dtype=jnp.float32,
            param_dtype=jnp.float32)

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        c2_hw = (feats[0].shape[1], feats[0].shape[2])
        fpn_feats = self.fpn(feats[-3:], train)
        proto_out = self.proto_net(fpn_feats[0], c2_hw)  # [B,H2,W2,P]

        class_preds, box_preds, coef_preds = [], [], []
        for f in fpn_feats:
            conf, box, coef = self.head(f)
            b, h, w, _ = f.shape
            class_preds.append(conf.reshape(b, h, w, 3, self.num_classes))
            box_preds.append(box.reshape(b, h, w, 3, 4))
            coef_preds.append(coef.reshape(b, h, w, 3, self.proto_planes))

        seg_pred = self.semantic_seg_conv(fpn_feats[0].astype(jnp.float32))
        return class_preds, box_preds, coef_preds, proto_out, seg_pred


def _yolact(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return YOLACT(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_yolact(**kwargs):
    return _yolact("resnet18", **kwargs)


@MODELS.register()
def resnet34_yolact(**kwargs):
    return _yolact("resnet34", **kwargs)


@MODELS.register()
def resnet50_yolact(**kwargs):
    return _yolact("resnet50", **kwargs)


@MODELS.register()
def resnet101_yolact(**kwargs):
    return _yolact("resnet101", **kwargs)


@MODELS.register()
def resnet152_yolact(**kwargs):
    return _yolact("resnet152", **kwargs)


@MODELS.register()
def vanb2_yolact(**kwargs):
    return _yolact("van_b2", **kwargs)


@MODELS.register()
def convformerm36_yolact(**kwargs):
    return _yolact("convformer_m36", **kwargs)
