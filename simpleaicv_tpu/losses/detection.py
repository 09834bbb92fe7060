"""Detection losses: RetinaLoss + FCOSLoss.

Parity: reference simpleAICV/detection/losses.py:126-432 (RetinaLoss: IoU
anchor assignment at 0.4/0.5, focal cls + SmoothL1-or-IoU box loss, both
normalised by positive count) and :432-836 (FCOSLoss: center-sampling
assignment with per-level scale ranges ``mi``, focal cls + centerness-weighted
IoU reg + centerness BCE).

TPU-first redesign: the reference assigns targets with a per-image python loop
and boolean filtering (dynamic shapes). Here assignment is a single vmapped
masked computation over the fixed-shape [B, max_annots, 5] annotation tensor
(pad class −1, the collater contract the reference already uses), so the whole
loss jits into the train step. Assignment equivalence is covered by golden
tests against a literal numpy re-statement of the reference rules.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import LOSSES
from ..models.detection.anchor import FCOSPositions, RetinaAnchors
from ..ops.iou import iou_method

INF = 100000000.0


def _focal_loss(cls_preds, gt_one_hot, valid_mask, positive_num, alpha, gamma):
    """Masked focal loss summed over valid anchors / positives-normalised.
    cls_preds are probabilities clamped to [1e-4, 1-1e-4]."""
    p = jnp.clip(cls_preds.astype(jnp.float32), 1e-4, 1.0 - 1e-4)
    alpha_f = jnp.where(gt_one_hot == 1.0, alpha, 1.0 - alpha)
    pt = jnp.where(gt_one_hot == 1.0, p, 1.0 - p)
    focal_w = alpha_f * jnp.power(1.0 - pt, gamma)
    bce = -(gt_one_hot * jnp.log(p) + (1.0 - gt_one_hot) * jnp.log(1.0 - p))
    loss = jnp.sum(focal_w * bce * valid_mask[:, :, None])
    return loss / jnp.clip(positive_num, 1.0, None)


@LOSSES.register()
class RetinaLoss:

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256), (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128),
                 alpha=0.25, gamma=2.0, beta=1.0 / 9.0,
                 cls_loss_weight=1.0, box_loss_weight=1.0,
                 box_loss_type="SmoothL1"):
        self.anchors = RetinaAnchors(areas, ratios, scales, strides)
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.box_loss_type = box_loss_type

    def __call__(self, preds, annotations):
        """preds: (cls_preds list of [B,H,W,A,C] probs, reg_preds list of
        [B,H,W,A,4]); annotations: [B, M, 5] (x1,y1,x2,y2,class; pad class<0)."""
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = cls_preds[0].shape[0]
        num_classes = cls_preds[0].shape[-1]
        cls_preds = jnp.concatenate(
            [p.reshape(b, -1, num_classes) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in reg_preds], axis=1)

        gt_boxes, gt_cls = self._assign(anchors, annotations)
        # gt_cls: -1 ignore, 0 background, >0 class id (+1)

        valid = (gt_cls >= 0).astype(jnp.float32)
        positive = (gt_cls > 0).astype(jnp.float32)
        positive_num = jnp.sum(positive)

        one_hot = jax.nn.one_hot(jnp.clip(gt_cls, 0, None).astype(jnp.int32),
                                 num_classes + 1, dtype=jnp.float32)[..., 1:]
        cls_loss = _focal_loss(cls_preds, one_hot, valid, positive_num,
                               self.alpha, self.gamma)

        if self.box_loss_type == "SmoothL1":
            targets = self._boxes_to_txtytwth(gt_boxes, anchors[None])
            x = jnp.abs(reg_preds.astype(jnp.float32) - targets)
            smooth = jnp.where(x >= self.beta, x - 0.5 * self.beta,
                               0.5 * x * x / self.beta)
            reg_loss = jnp.sum(jnp.sum(smooth, -1) * positive)
        else:
            pred_boxes = self._txtytwth_to_boxes(reg_preds, anchors[None])
            ious = iou_method(pred_boxes, gt_boxes,
                              iou_type=self.box_loss_type)
            reg_loss = jnp.sum((1.0 - ious) * positive)
        reg_loss = reg_loss / jnp.clip(positive_num, 1.0, None)
        # reference returns 0 when the batch has no positives
        no_pos = positive_num == 0
        cls_loss = jnp.where(no_pos, 0.0, cls_loss)
        reg_loss = jnp.where(no_pos, 0.0, reg_loss)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "reg_loss": self.box_loss_weight * reg_loss}

    def _assign(self, anchors, annotations):
        """Vectorized anchor assignment (reference :326-389).
        Returns (gt_boxes [B,N,4] — xyxy for IoU-type loss, gt class [B,N])."""

        def per_image(ann):
            gt = ann[:, :4]
            cls = ann[:, 4]
            gt_valid = cls >= 0
            ious = iou_method(anchors[:, None, :], gt[None, :, :])  # [N,M]
            ious = jnp.where(gt_valid[None, :], ious, -1.0)
            overlap = jnp.max(ious, axis=1)
            idx = jnp.argmax(ious, axis=1)
            assigned_cls = jnp.full(anchors.shape[0], -1.0, jnp.float32)
            assigned_cls = jnp.where(overlap < 0.4, 0.0, assigned_cls)
            assigned_cls = jnp.where(overlap >= 0.5, cls[idx] + 1.0,
                                     assigned_cls)
            # empty image: everything ignore (-1), reference :337-341
            any_gt = jnp.any(gt_valid)
            assigned_cls = jnp.where(any_gt, assigned_cls, -1.0)
            return gt[idx], assigned_cls

        return jax.vmap(per_image)(annotations.astype(jnp.float32))

    def _boxes_to_txtytwth(self, gt_boxes, anchors):
        awh = anchors[..., 2:4] - anchors[..., 0:2]
        actr = anchors[..., 0:2] + 0.5 * awh
        gwh = jnp.clip(gt_boxes[..., 2:4] - gt_boxes[..., 0:2], 1e-4, None)
        gctr = gt_boxes[..., 0:2] + 0.5 * gwh
        return jnp.concatenate([(gctr - actr) / awh, jnp.log(gwh / awh)], -1)

    def _txtytwth_to_boxes(self, reg, anchors):
        awh = anchors[..., 2:4] - anchors[..., 0:2]
        actr = anchors[..., 0:2] + 0.5 * awh
        wh = jnp.exp(reg[..., 2:4].astype(jnp.float32)) * awh
        ctr = reg[..., 0:2].astype(jnp.float32) * awh + actr
        return jnp.concatenate([ctr - 0.5 * wh, ctr + 0.5 * wh], -1)


@LOSSES.register()
class FCOSLoss:

    def __init__(self,
                 strides=(8, 16, 32, 64, 128),
                 mi=((-1, 64), (64, 128), (128, 256), (256, 512),
                     (512, INF)),
                 alpha=0.25, gamma=2.0,
                 cls_loss_weight=1.0, box_loss_weight=1.0,
                 center_ness_loss_weight=1.0, box_loss_iou_type="GIoU",
                 center_sample_radius=1.5, use_center_sample=True):
        self.positions = FCOSPositions(strides)
        self.mi = np.array(mi, np.float32)
        self.alpha = alpha
        self.gamma = gamma
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.center_ness_loss_weight = center_ness_loss_weight
        self.box_loss_iou_type = box_loss_iou_type
        self.center_sample_radius = center_sample_radius
        self.use_center_sample = use_center_sample

    def __call__(self, preds, annotations):
        cls_preds, reg_preds, center_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        pos_np, strides_np = self.positions.flat_positions_strides(
            feature_sizes)
        points = jnp.asarray(pos_np)           # [P,2]
        strides = jnp.asarray(strides_np)      # [P]
        mi = np.concatenate([
            np.tile(self.mi[i][None], (int(fs[0]) * int(fs[1]), 1))
            for i, fs in enumerate(feature_sizes)
        ])
        mi = jnp.asarray(mi)                   # [P,2]

        b = cls_preds[0].shape[0]
        num_classes = cls_preds[0].shape[-1]
        cls_preds = jnp.concatenate(
            [p.reshape(b, -1, num_classes) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in reg_preds], axis=1)
        center_preds = jnp.concatenate(
            [p.reshape(b, -1, 1) for p in center_preds], axis=1)

        ltrb, gt_cls, centerness = self._assign(points, strides, mi,
                                                annotations)

        valid = jnp.ones_like(gt_cls)  # all points contribute to cls loss
        positive = (gt_cls > 0).astype(jnp.float32)
        positive_num = jnp.sum(positive)

        one_hot = jax.nn.one_hot(gt_cls.astype(jnp.int32), num_classes + 1,
                                 dtype=jnp.float32)[..., 1:]
        cls_loss = _focal_loss(cls_preds, one_hot, valid, positive_num,
                               self.alpha, self.gamma)

        # reg: IoU loss weighted by centerness target
        exp_reg = jnp.exp(reg_preds.astype(jnp.float32))
        pred_min = points[None] - exp_reg[..., 0:2]
        pred_max = points[None] + exp_reg[..., 2:4]
        gt_min = points[None] - ltrb[..., 0:2]
        gt_max = points[None] + ltrb[..., 2:4]
        ious = iou_method(jnp.concatenate([pred_min, pred_max], -1),
                          jnp.concatenate([gt_min, gt_max], -1),
                          iou_type=self.box_loss_iou_type)
        reg_loss = jnp.sum((1.0 - ious) * centerness * positive)
        reg_loss = reg_loss / jnp.clip(positive_num, 1.0, None)

        cp = jnp.clip(center_preds[..., 0].astype(jnp.float32), 1e-4,
                      1.0 - 1e-4)
        cn_bce = -(centerness * jnp.log(cp) +
                   (1.0 - centerness) * jnp.log(1.0 - cp))
        center_loss = jnp.sum(cn_bce * positive) / jnp.clip(positive_num, 1.0,
                                                            None)

        no_pos = positive_num == 0
        cls_loss = jnp.where(no_pos, 0.0, cls_loss)
        reg_loss = jnp.where(no_pos, 0.0, reg_loss)
        center_loss = jnp.where(no_pos, 0.0, center_loss)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "reg_loss": self.box_loss_weight * reg_loss,
                "center_ness_loss": self.center_ness_loss_weight * center_loss}

    def _assign(self, points, strides, mi, annotations):
        """Vectorized FCOS assignment (reference :616-836).
        Returns (ltrb [B,P,4], class [B,P] (0 bg, id+1), centerness [B,P])."""
        radius = self.center_sample_radius
        use_cs = self.use_center_sample

        def per_image(ann):
            gt = ann[:, :4]            # [M,4]
            cls = ann[:, 4]
            gt_valid = cls >= 0        # [M]

            px = points[:, None, 0]
            py = points[:, None, 1]
            l = px - gt[None, :, 0]
            t = py - gt[None, :, 1]
            r = gt[None, :, 2] - px
            bb = gt[None, :, 3] - py
            ltrb = jnp.stack([l, t, r, bb], axis=-1)   # [P,M,4]

            inside = jnp.min(ltrb, axis=-1) > 0        # [P,M]
            pos_flag = inside
            if use_cs:
                ctr = (gt[None, :, 0:2] + gt[None, :, 2:4]) / 2
                dist = jnp.sqrt((px - ctr[..., 0])**2 + (py - ctr[..., 1])**2)
                pos_flag = pos_flag & (dist < strides[:, None] * radius)
            max_ltrb = jnp.max(ltrb, axis=-1)
            pos_flag = pos_flag & (max_ltrb > mi[:, None, 0]) \
                                & (max_ltrb < mi[:, None, 1]) \
                                & gt_valid[None, :]

            wh = gt[:, 2:4] - gt[:, 0:2]
            area = wh[:, 0] * wh[:, 1]                 # [M]
            area_masked = jnp.where(pos_flag, area[None, :], INF)
            choice = jnp.argmin(area_masked, axis=1)   # [P]
            has_pos = jnp.any(pos_flag, axis=1)        # [P]

            chosen_ltrb = jnp.take_along_axis(
                ltrb, choice[:, None, None].repeat(4, -1), axis=1)[:, 0]
            chosen_cls = cls[choice] + 1.0
            l_, t_, r_, b_ = (chosen_ltrb[:, 0], chosen_ltrb[:, 1],
                              chosen_ltrb[:, 2], chosen_ltrb[:, 3])
            cn = jnp.sqrt(
                jnp.clip((jnp.minimum(l_, r_) / jnp.maximum(l_, r_)) *
                         (jnp.minimum(t_, b_) / jnp.maximum(t_, b_)),
                         0.0, None))

            zero = jnp.zeros_like(chosen_cls)
            out_ltrb = jnp.where(has_pos[:, None], chosen_ltrb, 0.0)
            out_cls = jnp.where(has_pos, chosen_cls, zero)
            out_cn = jnp.where(has_pos, cn, zero)
            return out_ltrb, out_cls, out_cn

        return jax.vmap(per_image)(annotations.astype(jnp.float32))
