"""SAM losses (parity: reference
simpleAICV/interactive_segmentation/losses.py:12-244 — SAMMultiLevelLoss
(focal+dice+iou-pred-MSE averaged over mask levels), SAMMultiLevelIoUMaxLoss
(only the best-IoU level contributes), SAMMultiLevelAssignLoss) and the
distillation losses (distill_losses.py — encoder-feature MSE / full-SAM
distill)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["SAMMultiLevelLoss", "SAMMultiLevelIoUMaxLoss",
           "SAMMultiLevelAssignLoss",
           "SAMDistillMSELoss", "SAMDistillLoss"]


def _per_level_losses(pred_masks, pred_ious, targets, alpha, gamma, smooth,
                      mask_threshold):
    """pred_masks [B,K,H,W] logits; targets [B,H,W] or [B,1,H,W] binary.
    Returns per-level (focal [K], dice [K], iou_mse [K], iou_gt [B,K])."""
    b, k = pred_masks.shape[:2]
    t = targets.reshape(b, -1).astype(jnp.float32)
    logits = pred_masks.reshape(b, k, -1).astype(jnp.float32)

    # focal on bce-with-logits
    bce = jnp.maximum(logits, 0) - logits * t[:, None] + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    focal = alpha * (1.0 - jnp.exp(-bce))**gamma * bce
    focal_per_level = jnp.mean(focal, axis=(0, 2))

    p = jax.nn.sigmoid(logits)
    # sums run over the whole flattened batch, as the reference does
    inter = jnp.sum(p * t[:, None], axis=(0, 2))
    dice_per_level = 1.0 - (2 * inter + smooth) / (
        jnp.sum(p, axis=(0, 2)) + jnp.sum(t) + smooth)

    binary = (logits >= mask_threshold).astype(jnp.float32)
    bin_inter = jnp.sum(binary * t[:, None], axis=2)
    iou_gt = (bin_inter + smooth) / (
        jnp.sum(binary, 2) + jnp.sum(t, 1)[:, None] - bin_inter + smooth)
    iou_mse = jnp.sum((pred_ious.astype(jnp.float32) - iou_gt)**2,
                      axis=0) / b
    return focal_per_level, dice_per_level, iou_mse, iou_gt


@LOSSES.register()
class SAMMultiLevelLoss:

    def __init__(self, alpha=0.8, gamma=2.0, smooth=1e-4,
                 focal_loss_weight=20.0, dice_loss_weight=1.0,
                 iou_predict_loss_weight=1.0, mask_threshold=0.0):
        self.alpha = alpha
        self.gamma = gamma
        self.smooth = smooth
        self.focal_loss_weight = focal_loss_weight
        self.dice_loss_weight = dice_loss_weight
        self.iou_predict_loss_weight = iou_predict_loss_weight
        self.mask_threshold = mask_threshold

    def __call__(self, inputs, targets):
        pred_masks, pred_ious = inputs
        focal, dice, iou_mse, _ = _per_level_losses(
            pred_masks, pred_ious, targets, self.alpha, self.gamma,
            self.smooth, self.mask_threshold)
        return {
            "focal_loss": self.focal_loss_weight * jnp.mean(focal),
            "dice_loss": self.dice_loss_weight * jnp.mean(dice),
            "iou_predict_loss":
                self.iou_predict_loss_weight * jnp.mean(iou_mse),
        }


@LOSSES.register()
class SAMMultiLevelIoUMaxLoss(SAMMultiLevelLoss):
    """PER-SAMPLE best-IoU level selection (reference :134-244): for every
    image, the mask level whose binary IoU vs gt is highest (union + 1e-4
    form, :196-200) is picked and the single-level losses run on those
    gathered masks. Round 4 fixed this from a global argmax over the
    batch-mean IoU — a real semantic difference caught by the loss-parity
    harness (tests/test_reference_loss_parity.py)."""

    def __call__(self, inputs, targets):
        pred_masks, pred_ious = inputs
        b, k = pred_masks.shape[:2]
        t = targets.reshape(b, -1).astype(jnp.float32)
        logits = pred_masks.reshape(b, k, -1).astype(jnp.float32)

        binary = (logits >= self.mask_threshold).astype(jnp.float32)
        inter = jnp.sum(binary * t[:, None], axis=2)
        union = jnp.sum(binary, 2) + jnp.sum(t, 1)[:, None] - inter + 1e-4
        best = jnp.argmax(inter / union, axis=1)                  # [B]

        sel = jnp.take_along_axis(logits, best[:, None, None],
                                  axis=1)[:, 0]                   # [B,HW]
        sel_iou = jnp.take_along_axis(
            pred_ious.astype(jnp.float32), best[:, None], axis=1)[:, 0]

        bce = jnp.maximum(sel, 0) - sel * t + \
            jnp.log1p(jnp.exp(-jnp.abs(sel)))
        focal = jnp.mean(self.alpha * (1.0 - jnp.exp(-bce))**self.gamma * bce)

        p = jax.nn.sigmoid(sel)
        dice = 1.0 - (2 * jnp.sum(p * t) + self.smooth) / (
            jnp.sum(p) + jnp.sum(t) + self.smooth)

        sel_bin = (sel >= self.mask_threshold).astype(jnp.float32)
        bin_inter = jnp.sum(sel_bin * t, axis=1)
        iou_gt = (bin_inter + self.smooth) / (
            jnp.sum(sel_bin, 1) + jnp.sum(t, 1) - bin_inter + self.smooth)
        iou_mse = jnp.sum((sel_iou - iou_gt)**2) / b

        return {
            "focal_loss": self.focal_loss_weight * focal,
            "dice_loss": self.dice_loss_weight * dice,
            "iou_predict_loss": self.iou_predict_loss_weight * iou_mse,
        }


@LOSSES.register()
class SAMMultiLevelAssignLoss(SAMMultiLevelLoss):
    """Area-ratio level ASSIGNMENT (reference :244-458): each sample's
    gt-area ratio selects which mask levels train (strict open ranges,
    multiple levels may hit), per-sample mean over its valid levels,
    batch-mean over samples with >=1 valid level; dice runs per sample
    (not global-over-batch like the base loss). Vectorized fixed-shape
    equivalent of the reference's per-sample python loops."""

    def __init__(self, alpha=0.8, gamma=2.0, smooth=1e-4,
                 focal_loss_weight=20.0, dice_loss_weight=1.0,
                 iou_predict_loss_weight=1.0, mask_threshold=0.0,
                 idx_nums=4,
                 area_ranges=((0.04, 0.64), (0.0, 0.04), (0.01, 0.25),
                              (0.16, 1.0))):
        super().__init__(alpha, gamma, smooth, focal_loss_weight,
                         dice_loss_weight, iou_predict_loss_weight,
                         mask_threshold)
        assert len(area_ranges) == idx_nums
        self.idx_nums = idx_nums
        self.area_ranges = tuple(tuple(r) for r in area_ranges)

    def __call__(self, inputs, targets):
        pred_masks, pred_ious = inputs
        b, k = pred_masks.shape[:2]
        assert k == self.idx_nums
        t = targets.reshape(b, -1).astype(jnp.float32)       # [B,HW]
        logits = pred_masks.reshape(b, k, -1).astype(jnp.float32)

        ratio = jnp.sum(t, 1) / t.shape[1]                   # [B]
        lo = jnp.asarray([r[0] for r in self.area_ranges])
        hi = jnp.asarray([r[1] for r in self.area_ranges])
        valid = ((lo[None] < ratio[:, None])
                 & (ratio[:, None] < hi[None]))               # [B,K]
        n_valid = jnp.sum(valid, 1).astype(jnp.float32)      # [B]
        has = n_valid > 0
        n_has = jnp.clip(jnp.sum(has.astype(jnp.float32)), 1.0, None)

        def batch_mean(per_bi):                              # [B,K] -> scalar
            per_sample = (jnp.sum(jnp.where(valid, per_bi, 0.0), 1)
                          / jnp.clip(n_valid, 1.0, None))
            return jnp.sum(jnp.where(has, per_sample, 0.0)) / n_has

        bce = (jnp.maximum(logits, 0) - logits * t[:, None]
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        focal = batch_mean(jnp.mean(
            self.alpha * (1.0 - jnp.exp(-bce))**self.gamma * bce, axis=2))

        p = jax.nn.sigmoid(logits)
        inter = jnp.sum(p * t[:, None], axis=2)              # [B,K]
        dice = batch_mean(1.0 - (2 * inter + self.smooth) / (
            jnp.sum(p, 2) + jnp.sum(t, 1)[:, None] + self.smooth))

        binary = (logits >= self.mask_threshold).astype(jnp.float32)
        bin_inter = jnp.sum(binary * t[:, None], axis=2)
        iou_gt = (bin_inter + self.smooth) / (
            jnp.sum(binary, 2) + jnp.sum(t, 1)[:, None] - bin_inter +
            self.smooth)
        iou_sq = (pred_ious.astype(jnp.float32) - iou_gt)**2
        iou = batch_mean(iou_sq)

        return {
            "focal_loss": self.focal_loss_weight * focal,
            "dice_loss": self.dice_loss_weight * dice,
            "iou_predict_loss": self.iou_predict_loss_weight * iou,
        }


@LOSSES.register()
class SAMDistillMSELoss:
    """Encoder-feature distillation (reference distill_losses.py:11-25)."""

    def __call__(self, stu_feature, tea_feature):
        diff = stu_feature.astype(jnp.float32) - \
            tea_feature.astype(jnp.float32)
        return jnp.mean(diff**2)


@LOSSES.register()
class SAMDistillLoss:
    """Full-SAM distillation loss (reference distill_losses.py:27-170):
    teacher masks binarized at mask_threshold, then per-mask-slot
    focal (alpha*(1-exp(-bce))**gamma * bce, the reference's form) and
    global-over-batch dice on the student logits, plus MSE on the iou
    predictions; each term summed over mask slots and divided by batch."""

    def __init__(self, alpha=0.8, gamma=2.0, smooth=1e-4,
                 distill_focal_loss_weight=20.0, distill_dice_loss_weight=1.0,
                 distill_iou_predict_loss_weight=1.0, mask_threshold=0.0):
        self.alpha = alpha
        self.gamma = gamma
        self.smooth = smooth
        self.w_focal = distill_focal_loss_weight
        self.w_dice = distill_dice_loss_weight
        self.w_iou = distill_iou_predict_loss_weight
        self.mask_threshold = mask_threshold

    def __call__(self, tea_inputs, stu_inputs):
        tea_masks, tea_ious = tea_inputs
        stu_masks, stu_ious = stu_inputs
        b, n = stu_masks.shape[:2]
        tea = (tea_masks.astype(jnp.float32) > self.mask_threshold
               ).astype(jnp.float32).reshape(b, n, -1)
        stu = stu_masks.astype(jnp.float32).reshape(b, n, -1)

        bce = jnp.maximum(stu, 0) - stu * tea + jnp.log1p(jnp.exp(-jnp.abs(stu)))
        focal = self.alpha * (1.0 - jnp.exp(-bce)) ** self.gamma * bce
        focal_loss = jnp.sum(jnp.mean(focal, axis=(0, 2))) / b

        p = jax.nn.sigmoid(stu)
        inter = jnp.sum(p * tea, axis=(0, 2))          # per mask slot
        dice = 1.0 - (2.0 * inter + self.smooth) / (
            jnp.sum(p, axis=(0, 2)) + jnp.sum(tea, axis=(0, 2)) + self.smooth)
        dice_loss = jnp.sum(dice) / b

        iou_loss = jnp.sum((stu_ious.astype(jnp.float32) -
                            tea_ious.astype(jnp.float32)) ** 2) / b

        return {"distill_focal_loss": self.w_focal * focal_loss,
                "distill_dice_loss": self.w_dice * dice_loss,
                "distill_iou_predict_loss": self.w_iou * iou_loss}
