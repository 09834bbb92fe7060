"""DINO-DETR loss (parity: reference
simpleAICV/detection/losses.py:1084-1463 — Hungarian matching with focal-style
class cost (2/5/2 weights), sigmoid-focal cls + L1 + GIoU on the last layer,
aux decoder layers, the encoder-proposal 'interm' outputs, and the denoising
queries whose assignment is known (dn query i of a group <-> gt i,
losses.py:1496+))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES
from ..ops.iou import iou_method
from .detr import _cxcywh_to_xyxy, _hungarian_host, _pairwise_giou


@LOSSES.register()
class DINODETRLoss:

    def __init__(self, cls_match_cost=2.0, box_match_cost=5.0,
                 giou_match_cost=2.0, cls_loss_weight=1.0,
                 box_l1_loss_weight=5.0, iou_loss_weight=2.0, alpha=0.25,
                 gamma=2.0, num_classes=80, matcher="hungarian"):
        assert matcher in ("hungarian", "auction")
        self.matcher = matcher
        self.cls_match_cost = cls_match_cost
        self.box_match_cost = box_match_cost
        self.giou_match_cost = giou_match_cost
        self.cls_loss_weight = cls_loss_weight
        self.box_l1_loss_weight = box_l1_loss_weight
        self.iou_loss_weight = iou_loss_weight
        self.alpha = alpha
        self.gamma = gamma
        self.num_classes = num_classes

    # ---- matching (focal-style class cost, reference :1406-1462) ----
    def _match(self, cls_pred, reg_pred, annotations):
        # clamps and epsilons follow the reference exactly
        # (losses.py:1410-1432: sigmoid clamped to [1e-4, 1-1e-4], +1e-4 in
        # the logs) so matching decisions are bit-comparable
        p = jnp.clip(jax.nn.sigmoid(cls_pred.astype(jnp.float32)),
                     1e-4, 1.0 - 1e-4)
        reg_pred = jnp.clip(reg_pred, 1e-4, 1.0 - 1e-4)
        tgt_cls = jnp.clip(annotations[..., 4], 0, None).astype(jnp.int32)
        valid = annotations[..., 4] >= 0

        pos_cost = self.alpha * ((1 - p)**self.gamma) * (-jnp.log(p + 1e-4))
        neg_cost = (1 - self.alpha) * (p**self.gamma) * \
            (-jnp.log(1 - p + 1e-4))
        # [B,Q,M]
        idx = jnp.broadcast_to(tgt_cls[:, None, :, None],
                               (p.shape[0], p.shape[1], tgt_cls.shape[1], 1))
        cls_cost = (jnp.take_along_axis(pos_cost[:, :, None, :], idx,
                                        -1)[..., 0] -
                    jnp.take_along_axis(neg_cost[:, :, None, :], idx,
                                        -1)[..., 0])
        l1_cost = jnp.sum(jnp.abs(
            reg_pred[:, :, None, :4].astype(jnp.float32) -
            annotations[:, None, :, :4]), -1)
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
        return jax.pure_callback(
            _hungarian_host, jax.ShapeDtypeStruct((b, q), jnp.int32),
            cost, valid, vmap_method="sequential")

    def _losses_for(self, cls_pred, reg_pred, annotations, matched,
                    total_targets, supervise=None):
        """Focal cls + L1 + GIoU given matched gt indices (−1 unmatched:
        background-supervised). ``supervise`` [B,Q] optionally excludes
        queries from the cls loss entirely (dn PADDING slots — the reference
        never puts them in map_known_indice, dinodetr.py:233-246)."""
        safe = jnp.clip(matched, 0, None)
        gt_boxes = jnp.take_along_axis(annotations[..., :4], safe[..., None],
                                       1)
        gt_cls = jnp.take_along_axis(annotations[..., 4], safe, 1)
        is_m = (matched >= 0).astype(jnp.float32)

        p = jnp.clip(jax.nn.sigmoid(cls_pred.astype(jnp.float32)), 1e-4,
                     1 - 1e-4)
        one_hot = jax.nn.one_hot(
            jnp.clip(gt_cls, 0, None).astype(jnp.int32), self.num_classes)
        one_hot = one_hot * is_m[..., None]
        alpha_f = jnp.where(one_hot == 1.0, self.alpha, 1 - self.alpha)
        pt = jnp.where(one_hot == 1.0, p, 1 - p)
        bce = -(one_hot * jnp.log(p) + (1 - one_hot) * jnp.log(1 - p))
        focal = alpha_f * (1 - pt)**self.gamma * bce
        if supervise is not None:
            focal = focal * supervise.astype(jnp.float32)[..., None]
        cls_loss = jnp.sum(focal) / total_targets

        reg = jnp.clip(reg_pred.astype(jnp.float32), 1e-4, 1 - 1e-4)
        l1 = jnp.sum(jnp.abs(reg - gt_boxes), -1)
        l1_loss = jnp.sum(l1 * is_m) / total_targets
        giou = iou_method(_cxcywh_to_xyxy(reg), _cxcywh_to_xyxy(gt_boxes),
                          iou_type="GIoU")
        giou_loss = jnp.sum((1 - giou) * is_m) / total_targets
        return (self.cls_loss_weight * cls_loss,
                self.box_l1_loss_weight * l1_loss,
                self.iou_loss_weight * giou_loss)

    def __call__(self, preds, annotations):
        """preds: the DINODETR output dict; annotations [B,M,5]
        cxcywh-normalised + class (pad −1)."""
        annotations = annotations.astype(jnp.float32)
        valid_gt = annotations[..., 4] >= 0
        total_targets = jnp.clip(jnp.sum(valid_gt), 1.0, None)

        loss_dict = {}
        aux_cls = preds["aux_pred_logits"]
        aux_reg = preds["aux_pred_boxes"]
        for layer in range(aux_cls.shape[0]):
            # the reference re-runs Hungarian matching for EVERY aux layer
            # (losses.py:1190-1205), not just the last — round-4 parity fix
            matched = self._match(aux_cls[layer], aux_reg[layer],
                                  annotations)
            c, l1, g = self._losses_for(aux_cls[layer], aux_reg[layer],
                                        annotations, matched, total_targets)
            tag = "" if layer == aux_cls.shape[0] - 1 else f"layer_{layer}_"
            loss_dict[f"{tag}cls_loss"] = c
            loss_dict[f"{tag}box_l1_loss"] = l1
            loss_dict[f"{tag}box_iou_loss"] = g

        # encoder interm outputs get their own matching
        if "interm_pred_logits" in preds:
            im = self._match(preds["interm_pred_logits"],
                             preds["interm_pred_boxes"], annotations)
            c, l1, g = self._losses_for(preds["interm_pred_logits"],
                                        preds["interm_pred_boxes"],
                                        annotations, im, total_targets)
            loss_dict["interm_cls_loss"] = c
            loss_dict["interm_box_l1_loss"] = l1
            loss_dict["interm_box_iou_loss"] = g

        # denoising: known assignment (query j in a group <-> gt j%m);
        # positives regress/classify, negatives are background
        if "dn_meta" in preds and preds["dn_meta"] is not None:
            meta = preds["dn_meta"]
            # slot -> gt mapping comes from the model (dynamic group layout,
            # models/detection/dinodetr.py _prepare_dn); positives regress +
            # classify their gt, valid negatives are background, padding
            # slots are excluded from supervision entirely
            active = meta["dn_valid"] & meta["dn_is_positive"]
            dn_matched = jnp.where(active, meta["dn_gt_index"],
                                   -1).astype(jnp.int32)
            dn_cls = preds["dn_pred_logits"]
            dn_reg = preds["dn_pred_boxes"]
            dn_total = jnp.clip(jnp.sum(active), 1.0, None)
            for layer in range(dn_cls.shape[0]):
                c, l1, g = self._losses_for(dn_cls[layer], dn_reg[layer],
                                            annotations, dn_matched,
                                            dn_total,
                                            supervise=meta["dn_valid"])
                tag = ("dn_" if layer == dn_cls.shape[0] - 1
                       else f"dn_layer_{layer}_")
                loss_dict[f"{tag}cls_loss"] = c
                loss_dict[f"{tag}box_l1_loss"] = l1
                loss_dict[f"{tag}box_iou_loss"] = g
        return loss_dict
