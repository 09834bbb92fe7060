"""YOLACT loss (parity: reference
simpleAICV/instance_segmentation/losses.py:22-558 — SSD-style anchor matching
(bg<0.4, ignore 0.4-0.5, fg>=0.5, each gt force-matched to its best anchor),
OHEM softmax CE (neg:pos 3:1 ranked by logsumexp-bg score), smooth-L1 box
offsets with (0.1, 0.2) variances, box-cropped prototype-mask BCE normalised
by anchor area, and per-class semantic-seg BCE).

TPU-first: per-image loops/ragged positives become vmapped fixed-shape
computations with a ``choose_max_mask_num`` positive cap (the reference also
caps at 100, sampling randomly; we take the first 100 by anchor order).
GT masks arrive pre-downsampled to prototype resolution ([B,M,hp,wp] uint8),
the seg-head target is derived by 2x2 max-pooling those (the reference
bilinear-downsamples full-res masks; equivalent after >0.5 binarisation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import LOSSES
from ..models.instance_segmentation.yolact import YOLACTAnchors

__all__ = ["YOLACTLoss"]


@LOSSES.register()
class YOLACTLoss:

    def __init__(self, resize=544, resize_type="yolo_style",
                 scales=(24, 48, 96, 192, 384), ratios=(1, 0.5, 2),
                 strides=(8, 16, 32, 64, 128), cls_loss_weight=1.0,
                 box_loss_weight=1.5, mask_loss_weight=6.125,
                 semantic_seg_loss_weight=1.0, choose_max_mask_num=100):
        if resize_type == "retina_style":
            resize = int(round(resize * 1333.0 / 800))
        self.resize = resize
        self.anchors = YOLACTAnchors(resize=resize, scales=scales,
                                     ratios=ratios, strides=strides)
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.mask_loss_weight = mask_loss_weight
        self.semantic_seg_loss_weight = semantic_seg_loss_weight
        self.max_masks = choose_max_mask_num

    def __call__(self, preds, gt_bboxes, gt_masks):
        """gt_bboxes [B,M,5] RELATIVE xyxy + class (pad -1);
        gt_masks [B,M,hp,wp] binary at prototype resolution."""
        class_preds, box_preds, coef_preds, proto_outs, seg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in class_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = proto_outs.shape[0]
        nc = class_preds[0].shape[-1]
        cp = jnp.concatenate([p.reshape(b, -1, nc) for p in class_preds], 1)
        bp = jnp.concatenate([p.reshape(b, -1, 4) for p in box_preds], 1)
        kp = jnp.concatenate(
            [p.reshape(b, -1, p.shape[-1]) for p in coef_preds], 1)

        cls_labels, box_labels, max_gt_boxes, max_gt_idx = jax.vmap(
            lambda ann: self._assign(anchors, ann))(
            gt_bboxes.astype(jnp.float32))

        cls_loss = self._cls_loss(cp, cls_labels)
        box_loss = self._box_loss(bp, box_labels, cls_labels)
        mask_loss = self._mask_loss(kp, proto_outs, gt_masks, max_gt_boxes,
                                    max_gt_idx, cls_labels)
        seg_loss = self._semantic_seg_loss(seg_preds, gt_masks, gt_bboxes)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "box_loss": self.box_loss_weight * box_loss,
                "mask_loss": self.mask_loss_weight * mask_loss,
                "segmantic_seg_loss":
                    self.semantic_seg_loss_weight * seg_loss}

    # ---- assignment ----
    def _assign(self, anchors, ann):
        gt = ann[:, :4]
        cls = ann[:, 4]
        gt_valid = cls >= 0
        dec = jnp.concatenate([anchors[:, :2] - anchors[:, 2:] / 2,
                               anchors[:, :2] + anchors[:, 2:] / 2], 1)
        # iou [M, A]
        lt = jnp.maximum(gt[:, None, :2], dec[None, :, :2])
        rb = jnp.minimum(gt[:, None, 2:], dec[None, :, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
        area_a = (dec[:, 2] - dec[:, 0]) * (dec[:, 3] - dec[:, 1])
        iou = inter / jnp.clip(area_g[:, None] + area_a[None] - inter, 1e-8,
                               None)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)

        gt_best_anchor = jnp.argmax(iou, axis=1)          # [M]
        anchor_iou = jnp.max(iou, axis=0)                 # [A]
        anchor_gt = jnp.argmax(iou, axis=0)               # [A]
        # force each valid gt's best anchor (iou := 2, idx := gt)
        m = gt.shape[0]
        force = jnp.zeros_like(anchor_iou).at[gt_best_anchor].add(
            jnp.where(gt_valid, 2.0, 0.0))
        anchor_iou = jnp.where(force > 0, 2.0, anchor_iou)
        forced_idx = jnp.full_like(anchor_gt, -1).at[gt_best_anchor].set(
            jnp.where(gt_valid, jnp.arange(m), -1))
        anchor_gt = jnp.where(forced_idx >= 0, forced_idx, anchor_gt)

        cls_label = cls[anchor_gt] + 1.0
        cls_label = jnp.where(anchor_iou < 0.5, -1.0, cls_label)
        cls_label = jnp.where(anchor_iou < 0.4, 0.0, cls_label)
        any_gt = jnp.any(gt_valid)
        cls_label = jnp.where(any_gt, cls_label, 0.0)

        matched = gt[anchor_gt]
        variances = (0.1, 0.2)
        g_cxcy = ((matched[:, :2] + matched[:, 2:]) / 2 - anchors[:, :2]) / \
            (variances[0] * anchors[:, 2:])
        g_wh = jnp.log(jnp.clip(
            (matched[:, 2:] - matched[:, :2]) / anchors[:, 2:], 1e-8,
            None)) / variances[1]
        box_label = jnp.concatenate([g_cxcy, g_wh], 1)
        return cls_label, box_label, matched, anchor_gt

    # ---- losses ----
    def _cls_loss(self, class_preds, cls_labels, neg_ratio=3.0):
        b, a, nc = class_preds.shape
        logits = class_preds.astype(jnp.float32)
        pos = cls_labels > 0
        n_pos = jnp.sum(pos)
        # hard-negative score: logsumexp - bg logit
        mark = jax.nn.logsumexp(logits, axis=-1) - logits[..., 0]
        mark = jnp.where(pos | (cls_labels < 0), -jnp.inf, mark)
        order = jnp.argsort(-mark, axis=1)
        rank = jnp.zeros_like(order).at[
            jnp.arange(b)[:, None], order].set(jnp.arange(a)[None, :])
        n_neg_per_img = jnp.minimum(
            neg_ratio * jnp.sum(pos, axis=1, keepdims=True),
            jnp.sum(jnp.isfinite(mark), axis=1, keepdims=True))
        neg = (rank < n_neg_per_img) & ~pos & (cls_labels >= 0)

        labels = jnp.clip(cls_labels, 0, None).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss = jnp.sum(ce * (pos | neg))
        return jnp.where(n_pos > 0, loss / jnp.clip(n_pos, 1.0, None), 0.0)

    def _box_loss(self, box_preds, box_labels, cls_labels, beta=1.0):
        pos = (cls_labels > 0).astype(jnp.float32)
        n_pos = jnp.sum(pos)
        x = jnp.abs(box_preds.astype(jnp.float32) - box_labels)
        sl1 = jnp.where(x >= beta, x - 0.5 * beta, 0.5 * x * x / beta)
        loss = jnp.sum(jnp.sum(sl1, -1) * pos)
        return jnp.where(n_pos > 0, loss / jnp.clip(n_pos, 1.0, None), 0.0)

    def _mask_loss(self, coef_preds, proto_outs, gt_masks, max_gt_boxes,
                   max_gt_idx, cls_labels):
        b, hp, wp, p = proto_outs.shape
        k = self.max_masks
        pos = cls_labels > 0
        n_pos_total = jnp.sum(pos)

        def per_image(coefs, proto, masks, boxes, gidx, posm):
            sel_score, sel = jax.lax.top_k(posm.astype(jnp.float32), k)
            valid = sel_score > 0
            c = coefs[sel]                      # [k,P]
            gbox = boxes[sel]                   # [k,4] relative
            gmask = masks[gidx[sel]]            # [k,hp,wp]
            pred = jnp.einsum("kp,hwp->khw", c, proto.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            pred = jnp.clip(jax.nn.sigmoid(pred), 1e-4, 1 - 1e-4)
            # crop to box
            x1 = jnp.clip(jnp.minimum(gbox[:, 0], gbox[:, 2]) * wp - 1, 0,
                          None)
            x2 = jnp.clip(jnp.maximum(gbox[:, 0], gbox[:, 2]) * wp + 1, None,
                          wp)
            y1 = jnp.clip(jnp.minimum(gbox[:, 1], gbox[:, 3]) * hp - 1, 0,
                          None)
            y2 = jnp.clip(jnp.maximum(gbox[:, 1], gbox[:, 3]) * hp + 1, None,
                          hp)
            cols = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
            rows = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
            crop = ((cols >= x1[:, None, None]) & (cols < x2[:, None, None]) &
                    (rows >= y1[:, None, None]) & (rows < y2[:, None, None]))
            pred = jnp.where(crop, pred, 1e-4)
            # the reference does NOT crop the gt mask (losses.py:270-293):
            # gt pixels outside the (padded) box are penalized at pred=1e-4
            gm = gmask.astype(jnp.float32)
            bce = -(gm * jnp.log(pred) + (1 - gm) * jnp.log(1 - pred))
            # normalized by the matched gt box area in RELATIVE units
            # (losses.py:296-301; the hp*wp factor lives in the outer
            # denominator only — round-4 parity fix, was divided twice)
            area = jnp.clip((gbox[:, 2] - gbox[:, 0]) *
                            (gbox[:, 3] - gbox[:, 1]), 1e-8, None)
            per = jnp.sum(bce, axis=(1, 2)) / area
            return jnp.sum(per * valid)

        total = jnp.sum(jax.vmap(per_image)(
            coef_preds, proto_outs, gt_masks.astype(jnp.float32),
            max_gt_boxes, max_gt_idx, pos))
        denom = hp * wp * jnp.clip(n_pos_total, 1.0, None)
        return jnp.where(n_pos_total > 0, total / denom, 0.0)

    def _semantic_seg_loss(self, seg_preds, gt_masks, gt_bboxes):
        b, sh, sw, nc = seg_preds.shape
        # downsample proto-res gt masks to seg res by max pooling
        masks = gt_masks.astype(jnp.float32)
        hp, wp = masks.shape[2], masks.shape[3]
        fy, fx = hp // sh, wp // sw
        if fy > 1 or fx > 1:
            m = masks.reshape(b, masks.shape[1], sh, fy, sw, fx)
            masks = jnp.max(m, axis=(3, 5))
        cls = gt_bboxes[..., 4]
        valid = (cls >= 0).astype(jnp.float32)
        one_hot = jax.nn.one_hot(jnp.clip(cls, 0, nc - 1).astype(jnp.int32),
                                 nc)  # [B,M,nc]
        # per-class max over instances
        target = jnp.max(masks[:, :, :, :, None] *
                         (one_hot * valid[..., None])[:, :, None, None, :],
                         axis=1)
        p = jnp.clip(jax.nn.sigmoid(seg_preds.astype(jnp.float32)), 1e-4,
                     1 - 1e-4)
        bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
        return jnp.sum(bce) / (sh * sw * b)
