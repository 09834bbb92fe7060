"""RetinaFace face detection (parity: reference
simpleAICV/face_detection/models/retinaface.py:27-142 — backbone C3-C5 + 3-
level FPN + SSH context modules + per-level sigmoid cls (1 class) and box
heads; anchors are square per-level sizes, RetinaFaceAnchors anchor.py:7)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.registry import BACKBONES, DECODERS, LOSSES, MODELS
from .common import ConvBnAct
from .detection.fpn import _upsample_to
from .detection.decode import _decode_batch
from ..losses.detection import RetinaLoss
from ..ops.iou import iou_method

import jax

__all__ = ["RetinaFace", "RetinaFaceAnchors", "RetinaFaceLoss",
           "RetinaFaceDecoder", "resnet18_retinaface", "resnet34_retinaface",
           "resnet50_retinaface", "resnet101_retinaface",
           "resnet152_retinaface"]


class RetinaFaceAnchors:
    """Square anchors per level (reference anchor.py:7-60)."""

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32)):
        self.anchor_sizes = [np.asarray(s, np.float32) for s in anchor_sizes]
        self.strides = np.asarray(strides, np.float32)

    def flat_anchors(self, fpn_feature_sizes):
        out = []
        for sizes, stride, fm in zip(self.anchor_sizes, self.strides,
                                     fpn_feature_sizes):
            w, h = int(fm[0]), int(fm[1])
            base = np.zeros((len(sizes), 4), np.float32)
            base[:, 0] = -sizes / 2
            base[:, 1] = -sizes / 2
            base[:, 2] = sizes / 2
            base[:, 3] = sizes / 2
            sx = (np.arange(w, dtype=np.float32) + 0.5) * stride
            sy = (np.arange(h, dtype=np.float32) + 0.5) * stride
            shift = np.stack(np.meshgrid(sx, sy), axis=-1)
            shift = np.tile(shift, (1, 1, 2))[:, :, None, :]
            out.append((base[None, None] + shift).reshape(-1, 4))
        return np.concatenate(out, axis=0)


class RetinaFaceFPN(nn.Module):
    """3-level merge FPN (reference face_detection/models/fpn.py:47-123:
    output1/2/3 are 1x1 ConvBnAct+ReLU; out3 is returned unmerged)."""
    planes: int = 256

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        c3, c4, c5 = inputs
        out1 = ConvBnAct(self.planes, 1, name="output1")(c3, train)
        out2 = ConvBnAct(self.planes, 1, name="output2")(c4, train)
        out3 = ConvBnAct(self.planes, 1, name="output3")(c5, train)
        out2 = out2 + _upsample_to(out3, out2.shape[1], out2.shape[2])
        out2 = ConvBnAct(self.planes, 3, name="merge2")(out2, train)
        out1 = out1 + _upsample_to(out2, out1.shape[1], out1.shape[2])
        out1 = ConvBnAct(self.planes, 3, name="merge1")(out1, train)
        return [out1, out2, out3]


class RetinaFaceSSH(nn.Module):
    """SSH context module: 3x3 + stacked-3x3 (5x5/7x7 receptive) branches."""
    planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        b3 = ConvBnAct(p // 2, 3, has_act=False, name="conv3X3")(x, train)
        m5 = ConvBnAct(p // 4, 3, name="conv5X5_1")(x, train)
        b5 = ConvBnAct(p // 4, 3, has_act=False, name="conv5X5_2")(m5, train)
        m7 = ConvBnAct(p // 4, 3, name="conv7X7_1")(m5, train)
        b7 = ConvBnAct(p // 4, 3, has_act=False, name="conv7X7_2")(m7, train)
        return nn.relu(jnp.concatenate([b3, b5, b7], axis=-1))


class RetinaFace(nn.Module):
    backbone_type: str
    planes: int = 256
    anchor_num: int = 3
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = RetinaFaceFPN(planes=self.planes)
        self.sshs = [RetinaFaceSSH(self.planes) for _ in range(3)]
        self.cls_convs = [
            nn.Conv(self.anchor_num, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32) for _ in range(3)]
        self.box_convs = [
            nn.Conv(self.anchor_num * 4, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32) for _ in range(3)]

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)[-3:]
        feats = self.fpn(feats, train)
        cls_heads, box_heads = [], []
        for i, f in enumerate(feats):
            f = self.sshs[i](f, train)
            b, h, w, _ = f.shape
            cls = nn.sigmoid(self.cls_convs[i](f.astype(jnp.float32)))
            cls_heads.append(cls.reshape(b, h, w, self.anchor_num, 1))
            box = self.box_convs[i](f.astype(jnp.float32))
            box_heads.append(box.reshape(b, h, w, self.anchor_num, 4))
        return [cls_heads, box_heads]


@LOSSES.register()
class RetinaFaceLoss(RetinaLoss):
    """Reference losses.py:23-212: RetinaLoss shape but square face anchors,
    1-class sigmoid, assignment threshold 0.35 for both bg and fg."""

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32), alpha=0.25, gamma=2.0, beta=1.0 / 9.0,
                 cls_loss_weight=1.0, box_loss_weight=1.0,
                 box_loss_type="CIoU"):
        self.anchors = RetinaFaceAnchors(anchor_sizes, strides)
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.box_loss_type = box_loss_type

    def _assign(self, anchors, annotations):

        def per_image(ann):
            gt = ann[:, :4]
            cls = ann[:, 4]
            gt_valid = cls >= 0
            ious = iou_method(anchors[:, None, :], gt[None, :, :])
            ious = jnp.where(gt_valid[None, :], ious, -1.0)
            overlap = jnp.max(ious, axis=1)
            idx = jnp.argmax(ious, axis=1)
            assigned = jnp.where(overlap < 0.35, 0.0, cls[idx] + 1.0)
            any_gt = jnp.any(gt_valid)
            assigned = jnp.where(any_gt, assigned, -1.0)
            return gt[idx], assigned

        return jax.vmap(per_image)(annotations.astype(jnp.float32))


@DECODERS.register()
class RetinaFaceDecoder:
    """Reference decode.py:24 — same decode pipeline with face anchors."""

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32), max_object_num=100,
                 min_score_threshold=0.05, topn=1000, nms_type="python_nms",
                 nms_threshold=0.5):
        self.anchors = RetinaFaceAnchors(anchor_sizes, strides)
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn
        self.nms_type = "python_nms" if nms_type == "torch_nms" else nms_type
        self.nms_threshold = nms_threshold

    def __call__(self, preds):
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = cls_preds[0].shape[0]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 1) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds], axis=1)
        scores = cls_preds[..., 0]
        classes = jnp.zeros_like(scores)

        awh = anchors[None, :, 2:4] - anchors[None, :, 0:2]
        actr = anchors[None, :, 0:2] + 0.5 * awh
        wh = jnp.exp(reg_preds[..., 2:4].astype(jnp.float32)) * awh
        ctr = reg_preds[..., 0:2].astype(jnp.float32) * awh + actr
        boxes = jnp.floor(jnp.concatenate([ctr - 0.5 * wh, ctr + 0.5 * wh],
                                          axis=2))
        s, c, bx = _decode_batch(scores, classes, boxes,
                                 max_object_num=self.max_object_num,
                                 min_score_threshold=self.min_score_threshold,
                                 topn=self.topn, nms_type=self.nms_type,
                                 nms_threshold=self.nms_threshold)
        return [np.asarray(s), np.asarray(c), np.asarray(bx)]


def _retinaface(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return RetinaFace(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_retinaface(**kwargs):
    return _retinaface("resnet18", **kwargs)


@MODELS.register()
def resnet34_retinaface(**kwargs):
    return _retinaface("resnet34", **kwargs)


@MODELS.register()
def resnet50_retinaface(**kwargs):
    return _retinaface("resnet50", **kwargs)


@MODELS.register()
def resnet101_retinaface(**kwargs):
    return _retinaface("resnet101", **kwargs)


@MODELS.register()
def resnet152_retinaface(**kwargs):
    return _retinaface("resnet152", **kwargs)
