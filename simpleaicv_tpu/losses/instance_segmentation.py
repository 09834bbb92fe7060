"""SOLOv2 loss (parity: reference
simpleAICV/instance_segmentation/losses.py:561-900 — per-level grid
assignment by gt scale range + mask center-of-mass with sigma-shrunk center
region (3x3-cell cap around the center cell), focal category loss normalised
by positive count, dice loss on dynamically-convolved instance masks).

TPU-first redesign: the reference's per-image/per-gt python loops and ragged
kernel gathers become one fixed-shape computation: positive (cell, gt) pairs
are enumerated as a [P_cells, M] mask per level, the top ``max_pairs``
(by validity) are gathered, their kernels are batch-matmuled against the mask
features (dynamic conv == einsum) and dice is masked by pair validity.
The default cap is 9*M (each gt claims at most a 3x3 cell region), which is
LOSSLESS at any annotation count — equivalence vs the reference loss is
stress-tested at the COCO-max 93 objects (tests/test_reference_loss_parity).
Pass ``max_pairs_per_level`` explicitly only to subsample dice for memory.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import LOSSES

INF = 1e8


@LOSSES.register()
class SOLOV2Loss:

    def __init__(self,
                 scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768),
                               (384, 2048)),
                 grid_nums=(40, 36, 24, 16, 12),
                 mask_feature_upsample_scale=4, sigma=0.2, alpha=0.25,
                 gamma=2.0, cls_loss_weight=1.0, dice_loss_weight=3.0,
                 max_pairs_per_level=None):
        self.scale_ranges = scale_ranges
        self.grid_nums = grid_nums
        self.upsample_scale = mask_feature_upsample_scale
        self.sigma = sigma
        self.alpha = alpha
        self.gamma = gamma
        self.cls_loss_weight = cls_loss_weight
        self.dice_loss_weight = dice_loss_weight
        self.max_pairs = max_pairs_per_level

    def __call__(self, preds, gt_bboxes, gt_masks):
        """preds: (mask_feat [B,h,w,C], kernel_preds list [B,g,g,C],
        cate_preds list [B,g,g,num_classes]);
        gt_bboxes [B,M,5] (xyxy+cls, pad -1); gt_masks [B,M,h,w] binary at
        mask-feature resolution (pre-downscaled by the collater)."""
        mask_feat, kernel_preds, cate_preds = preds
        b = mask_feat.shape[0]
        num_classes = cate_preds[0].shape[-1]
        fh, fw = mask_feat.shape[1], mask_feat.shape[2]
        input_h = fh * self.upsample_scale
        input_w = fw * self.upsample_scale

        gt_cls = gt_bboxes[..., 4]
        gt_valid = gt_cls >= 0
        boxes = gt_bboxes[..., :4].astype(jnp.float32)
        wh = boxes[..., 2:4] - boxes[..., 0:2]
        areas = jnp.sqrt(jnp.clip(wh[..., 0] * wh[..., 1], 0.0, None))

        # mask center of mass at feature res -> input coords
        m = gt_masks.astype(jnp.float32)
        m00 = jnp.clip(jnp.sum(m, axis=(2, 3)), 1e-4, None)
        ys = jnp.arange(fh, dtype=jnp.float32)[None, None, :, None]
        xs = jnp.arange(fw, dtype=jnp.float32)[None, None, None, :]
        cx = jnp.sum(m * xs, axis=(2, 3)) / m00 * self.upsample_scale
        cy = jnp.sum(m * ys, axis=(2, 3)) / m00 * self.upsample_scale
        mask_nonempty = jnp.sum(m, axis=(2, 3)) > 0

        half_w = 0.5 * wh[..., 0] * self.sigma
        half_h = 0.5 * wh[..., 1] * self.sigma

        total_cls = jnp.zeros((), jnp.float32)
        total_dice = jnp.zeros((), jnp.float32)
        total_pos = jnp.zeros((), jnp.float32)
        total_dice_pairs = jnp.zeros((), jnp.float32)

        for level, ((lo, hi), g) in enumerate(
                zip(self.scale_ranges, self.grid_nums)):
            hit = gt_valid & (areas >= lo) & (areas <= hi) & mask_nonempty

            def cell_range(center, half, size):
                coord = jnp.floor(center / size * g).astype(jnp.int32)
                low = jnp.floor((center - half) / size * g).astype(jnp.int32)
                high = jnp.floor((center + half) / size * g).astype(jnp.int32)
                low = jnp.maximum(jnp.maximum(low, 0), coord - 1)
                high = jnp.minimum(jnp.minimum(high, g - 1), coord + 1)
                return low, high

            left, right = cell_range(cx, half_w, input_w)
            top, down = cell_range(cy, half_h, input_h)

            gi = jnp.arange(g)
            # cell-in-range masks [B,M,g]
            row_in = (gi[None, None, :] >= top[..., None]) & \
                     (gi[None, None, :] <= down[..., None])
            col_in = (gi[None, None, :] >= left[..., None]) & \
                     (gi[None, None, :] <= right[..., None])
            # [B,M,g,g]
            assign = row_in[..., :, None] & col_in[..., None, :] & \
                hit[..., None, None]

            # category label per cell: LAST matching gt wins (reference
            # overwrites sequentially)
            mm = assign.shape[1]
            gt_rank = jnp.arange(1, mm + 1, dtype=jnp.float32)
            pick = jnp.argmax(assign.astype(jnp.float32) *
                              gt_rank[None, :, None, None], axis=1)  # [B,g,g]
            any_assign = jnp.any(assign, axis=1)
            cate_label = jnp.where(
                any_assign,
                jnp.take_along_axis(gt_cls, pick.reshape(b, -1),
                                    axis=1).reshape(b, g, g) + 1.0, 0.0)

            # focal loss over this level (counts positives per cell-instance)
            cate = jnp.clip(jax.nn.sigmoid(
                cate_preds[level].astype(jnp.float32)), 1e-4, 1 - 1e-4)
            one_hot = jax.nn.one_hot(cate_label.astype(jnp.int32),
                                     num_classes + 1)[..., 1:]
            alpha_f = jnp.where(one_hot == 1.0, self.alpha, 1 - self.alpha)
            pt = jnp.where(one_hot == 1.0, cate, 1.0 - cate)
            bce = -(one_hot * jnp.log(cate) +
                    (1 - one_hot) * jnp.log(1 - cate))
            total_cls = total_cls + jnp.sum(
                alpha_f * (1 - pt)**self.gamma * bce)
            total_pos = total_pos + jnp.sum(any_assign)

            # ---- dice on positive (cell, gt) pairs (capped) ----
            pair_valid = assign.reshape(b, mm, g * g)  # [B,M,G2]
            flat = pair_valid.transpose(0, 2, 1).reshape(b, -1)  # [B,G2*M]
            # each gt claims at most a 3x3 cell region (reference
            # losses.py:878-884 top/down/left/right clamp to coord+-1), so
            # 9*M pairs is LOSSLESS; the default cap is therefore exact at
            # any annotation count, and max_pairs_per_level only exists to
            # trade memory for a subsampled dice estimate on huge images.
            cap = self.max_pairs if self.max_pairs else 9 * mm
            k = min(cap, flat.shape[1])
            scores, idx = jax.lax.top_k(flat.astype(jnp.float32), k)
            cell_idx = idx // mm
            gt_idx = idx % mm
            valid_pair = scores > 0  # [B,k]

            kernels = kernel_preds[level].reshape(b, g * g, -1)
            sel_kernels = jnp.take_along_axis(
                kernels, cell_idx[..., None], axis=1)  # [B,k,C]
            pred_masks = jnp.einsum(
                "bkc,bhwc->bkhw", sel_kernels,
                mask_feat.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            pred_masks = jnp.clip(jax.nn.sigmoid(pred_masks), 1e-4, 1 - 1e-4)
            sel_gt = jnp.take_along_axis(
                m, gt_idx[:, :, None, None].repeat(fh, 2).repeat(fw, 3),
                axis=1)

            a = jnp.sum(pred_masks * sel_gt, axis=(2, 3))
            bb = jnp.sum(pred_masks * pred_masks, axis=(2, 3))
            cc = jnp.sum(sel_gt * sel_gt, axis=(2, 3))
            dice = 1.0 - 2.0 * a / (bb + cc + 1e-4)
            total_dice = total_dice + jnp.sum(dice * valid_pair)
            total_dice_pairs = total_dice_pairs + jnp.sum(valid_pair)

        cls_loss = jnp.where(total_pos > 0,
                             total_cls / jnp.clip(total_pos, 1.0, None), 0.0)
        dice_loss = jnp.where(
            total_dice_pairs > 0,
            total_dice / jnp.clip(total_dice_pairs, 1.0, None), 0.0)
        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "dice_loss": self.dice_loss_weight * dice_loss}
