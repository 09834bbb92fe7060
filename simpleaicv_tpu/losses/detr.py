"""DETR loss with Hungarian matching (parity: reference
simpleAICV/detection/losses.py:836-1083 — per-decoder-layer CE (background
weight 0.1) + L1 + GIoU on Hungarian-matched pairs; matching costs 1/5/2 on
class-prob/L1/GIoU; scipy linear_sum_assignment with INF masking of padded
targets, losses.py:1050-1079).

TPU-first: the matcher runs on host via ``jax.pure_callback`` (SURVEY.md §7
plan: scipy-in-callback first, auction/Sinkhorn as a later optimisation); cost
matrices are computed on device. Everything downstream is fixed-shape masked
math: the callback returns a per-query matched-gt index (−1 unmatched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import LOSSES
from ..ops.iou import iou_method


def _cxcywh_to_xyxy(b):
    return jnp.concatenate([b[..., :2] - b[..., 2:] / 2,
                            b[..., :2] + b[..., 2:] / 2], axis=-1)


def _pairwise_giou(a, b):
    """a [Q,4], b [M,4] xyxy -> [Q,M] GIoU."""
    return iou_method(a[:, None, :], b[None, :, :], iou_type="GIoU")


def _hungarian_host(cost, valid_m):
    """cost [B,Q,M]; valid_m [B,M] bool -> matched gt idx per query [B,Q]
    (−1 unmatched)."""
    from scipy.optimize import linear_sum_assignment
    cost = np.asarray(cost)
    valid_m = np.asarray(valid_m)
    b, q, m = cost.shape
    out = np.full((b, q), -1, np.int32)
    for i in range(b):
        mv = valid_m[i]
        if not mv.any():
            continue
        sub = cost[i][:, mv]
        sub = np.nan_to_num(sub, posinf=1e8, neginf=-1e8)
        rows, cols = linear_sum_assignment(sub)
        gt_ids = np.nonzero(mv)[0]
        out[i, rows] = gt_ids[cols]
    return out


@LOSSES.register()
class DETRLoss:

    def __init__(self, cls_match_cost=1.0, box_match_cost=5.0,
                 giou_match_cost=2.0, cls_loss_weight=1.0,
                 box_l1_loss_weight=5.0, iou_loss_weight=2.0,
                 no_object_cls_weight=0.1, num_classes=80,
                 matcher="hungarian"):
        assert matcher in ("hungarian", "auction")
        self.matcher = matcher
        self.cls_match_cost = cls_match_cost
        self.box_match_cost = box_match_cost
        self.giou_match_cost = giou_match_cost
        self.cls_loss_weight = cls_loss_weight
        self.box_l1_loss_weight = box_l1_loss_weight
        self.iou_loss_weight = iou_loss_weight
        self.no_object_cls_weight = no_object_cls_weight
        self.num_classes = num_classes

    def _match(self, cls_pred, reg_pred, annotations):
        """Last-layer outputs -> matched gt index [B,Q]."""
        probs = jax.nn.softmax(cls_pred.astype(jnp.float32), -1)
        tgt_cls = jnp.clip(annotations[..., 4], 0, None).astype(jnp.int32)
        valid = annotations[..., 4] >= 0

        cls_cost = -jnp.take_along_axis(
            probs[:, :, None, :],
            jnp.broadcast_to(tgt_cls[:, None, :, None],
                             (probs.shape[0], probs.shape[1],
                              tgt_cls.shape[1], 1)), axis=-1)[..., 0]
        l1_cost = jnp.sum(jnp.abs(
            reg_pred[:, :, None, :4].astype(jnp.float32) -
            annotations[:, None, :, :4]), axis=-1)
        giou_cost = -jax.vmap(_pairwise_giou)(
            _cxcywh_to_xyxy(reg_pred[..., :4].astype(jnp.float32)),
            _cxcywh_to_xyxy(annotations[..., :4]))
        cost = (self.cls_match_cost * cls_cost +
                self.box_match_cost * l1_cost +
                self.giou_match_cost * giou_cost)
        cost = jnp.where(valid[:, None, :], cost, 1e8)
        cost = jax.lax.stop_gradient(cost)

        if self.matcher == "auction":
            from ..ops.matcher import auction_match_batch
            return auction_match_batch(cost, valid)
        b, q = cls_pred.shape[:2]
        matched = jax.pure_callback(
            _hungarian_host,
            jax.ShapeDtypeStruct((b, q), jnp.int32),
            cost, valid, vmap_method="sequential")
        return matched

    def __call__(self, preds, annotations):
        """preds: (cls [L,B,Q,C+1], reg [L,B,Q,4]);
        annotations [B,M,5] cxcywh (normalised) + class, pad −1."""
        cls_preds, reg_preds = preds
        reg_preds = jnp.clip(reg_preds, 1e-4, 1.0 - 1e-4)
        annotations = annotations.astype(jnp.float32)
        matched = self._match(cls_preds[-1], reg_preds[-1], annotations)

        valid_gt = annotations[..., 4] >= 0
        n_matched = jnp.sum(matched >= 0, axis=1)
        total_targets = jnp.clip(jnp.sum(valid_gt), 1.0, None)

        safe_idx = jnp.clip(matched, 0, None)
        gt_boxes = jnp.take_along_axis(annotations[..., :4],
                                       safe_idx[..., None], axis=1)
        gt_cls = jnp.take_along_axis(annotations[..., 4], safe_idx, axis=1)
        is_matched = matched >= 0
        target_classes = jnp.where(is_matched, gt_cls,
                                   float(self.num_classes)).astype(jnp.int32)

        class_weights = jnp.concatenate(
            [jnp.ones(self.num_classes),
             jnp.asarray([self.no_object_cls_weight])])

        loss_dict = {}
        for layer in range(cls_preds.shape[0]):
            logp = jax.nn.log_softmax(
                cls_preds[layer].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, target_classes[..., None],
                                       -1)[..., 0]
            w = class_weights[target_classes]
            cls_loss = jnp.sum(nll * w) / jnp.clip(jnp.sum(w), 1e-8, None)

            reg = reg_preds[layer].astype(jnp.float32)
            l1 = jnp.sum(jnp.abs(reg - gt_boxes), -1)
            l1_loss = jnp.sum(l1 * is_matched) / total_targets
            giou = iou_method(_cxcywh_to_xyxy(reg), _cxcywh_to_xyxy(gt_boxes),
                              iou_type="GIoU")
            giou_loss = jnp.sum((1.0 - giou) * is_matched) / total_targets

            loss_dict[f"layer_{layer}_cls_loss"] = \
                self.cls_loss_weight * cls_loss
            loss_dict[f"layer_{layer}_box_l1_loss"] = \
                self.box_l1_loss_weight * l1_loss
            loss_dict[f"layer_{layer}_box_iou_loss"] = \
                self.iou_loss_weight * giou_loss
        return loss_dict
