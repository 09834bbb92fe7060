"""SAM-matting loss stacks (parity: reference
simpleAICV/interactive_segmentation/losses_matting.py:18 SAMMattingOneLevelLoss,
:299 SAMMattingMultiLevelLoss, :609 SAMMattingMultiLevelIoUMaxLoss,
:922 SAMMattingMultiLevelAssignLoss).

All four stacks share eight loss terms over the SAM-matting model outputs
(global trimap 3-class pred, local alpha pred, fused alpha pred, iou pred)
and differ only in how mask levels are reduced:

  * OneLevel    — single mask level; plain batch reductions.
  * MultiLevel  — every level supervised against the broadcast GT.
  * IoUMaxLoss  — per sample, only the level whose thresholded fused pred has
                  max IoU with the GT mask is supervised.
  * AssignLoss  — levels are gated per sample by the GT alpha area ratio
                  falling inside that level's ``area_ranges`` window; the loss
                  is the masked level-mean then masked sample-mean.

TPU-first shape contract (NHWC, static level axis):
  images      [b,h,w,3]
  global_pred [b,L,h,w,3]   local/fused_pred [b,L,h,w,1]   iou_pred [b,L]
  alpha       [b,h,w]       trimap [b,h,w] (0/128/255)
  fg_map / bg_map [b,h,w,3]
OneLevel accepts L=1 (or unbatched level dim) inputs.

Everything is vectorised over (b, L) — the reference's per-sample Python loops
become masked reductions, so each stack is a single fused XLA computation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES
from .matting import _gauss_kernel

__all__ = ["SAMMattingOneLevelLoss", "SAMMattingMultiLevelLoss",
           "SAMMattingMultiLevelIoUMaxLoss", "SAMMattingMultiLevelAssignLoss"]

_EPS = 1e-4


def _convert_trimap(trimap):
    """0 -> 0 (bg), 255 -> 2 (global/fg), everything else -> 1 (local)."""
    t = trimap.astype(jnp.int32)
    return jnp.where(t == 0, 0, jnp.where(t == 255, 2, 1))


def _clip(x):
    return jnp.clip(x.astype(jnp.float32), _EPS, 1.0 - _EPS)


def _conv_gauss_nchw(img, kernel):
    """img [N,1,h,w] f32; replicate-pad + 5x5 depthwise (reference
    conv_gauss, losses_matting.py:209-217)."""
    pad = kernel.shape[0] // 2
    img = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    k = jnp.asarray(kernel)[None, None]
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _lap_pyramid_l1(pred, alpha, levels=5):
    """Per-item Laplacian-pyramid L1: pred/alpha [N,h,w] -> [N].

    Matches reference laplacian_pyramid + sum(F.l1_loss(...)) semantics
    (losses_matting.py:197-216) with per-item (not global) stage means; the
    callers reduce over items, which is identical for equal pixel counts.
    """
    kernel = _gauss_kernel()
    a = pred[:, None]
    b = alpha[:, None]
    total = jnp.zeros((pred.shape[0],), jnp.float32)
    for _ in range(levels):
        fa = _conv_gauss_nchw(a, kernel)
        fb = _conv_gauss_nchw(b, kernel)
        total = total + jnp.mean(jnp.abs((a - fa) - (b - fb)), axis=(1, 2, 3))
        a = jax.lax.reduce_window(fa, 0.0, jax.lax.add, (1, 1, 2, 2),
                                  (1, 1, 2, 2), "VALID") / 4.0
        b = jax.lax.reduce_window(fb, 0.0, jax.lax.add, (1, 1, 2, 2),
                                  (1, 1, 2, 2), "VALID") / 4.0
    total = total + jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))
    return total


def _as_leveled(x, rank):
    """Ensure a [b,L,...] level axis (OneLevel callers may pass [b,...])."""
    if x.ndim == rank - 1:
        return x[:, None]
    return x


class _Terms:
    """All eight loss terms at per-(b,L) granularity plus shared weights."""

    def __init__(self, images, preds, targets, mask_threshold):
        g, l, f, iou_pred = preds
        alpha, trimap, fg, bg = targets
        g = _as_leveled(g, 5)
        l = _as_leveled(l, 5)
        f = _as_leveled(f, 5)
        iou_pred = _as_leveled(iou_pred, 2).astype(jnp.float32)
        if alpha.ndim == 4:            # [b,h,w,1] -> [b,h,w]
            alpha = alpha[..., 0]
        b, L = g.shape[0], g.shape[1]
        h, w = g.shape[2], g.shape[3]

        alpha = alpha.astype(jnp.float32)
        img = images.astype(jnp.float32)
        gp = _clip(g)
        lp = _clip(l)[..., 0]
        fp = _clip(f)[..., 0]

        tri = _convert_trimap(trimap)
        onehot = jax.nn.one_hot(tri, 3, dtype=jnp.float32)[:, None]  # [b,1,h,w,3]

        # global trimap bce (losses_matting.py:93-119) — per-(b,L) mean
        bce = -(onehot * jnp.log(gp) + (1.0 - onehot) * jnp.log(1.0 - gp))
        self.ce = jnp.mean(bce, axis=(2, 3, 4))

        # global trimap iou (:120-142) — per-pixel channel-iou, per-(b,L) mean
        inter = jnp.sum(gp * onehot, axis=-1)
        union = jnp.sum(gp, -1) + jnp.sum(onehot, -1) - inter
        self.iou = jnp.mean(1.0 - (inter + _EPS) / (union + _EPS),
                            axis=(2, 3))

        # local alpha (:144-161): charbonnier on trimap==128 region
        wmask = (trimap == 128).astype(jnp.float32)[:, None]        # [b,1,h,w]
        diff = (lp - alpha[:, None]) * wmask
        self.local_alpha_num = jnp.sum(jnp.sqrt(diff**2 + 1e-12), axis=(2, 3))
        self.wsum = jnp.sum(wmask[:, 0], axis=(1, 2))               # [b]

        # local laplacian (:163-216): weighted pred/alpha pyramids
        lw = (lp * wmask).reshape(b * L, h, w)
        aw = jnp.broadcast_to(alpha[:, None] * wmask,
                              (b, L, h, w)).reshape(b * L, h, w)
        self.lap_local = _lap_pyramid_l1(lw, aw).reshape(b, L)

        # fusion alpha (:218-234): full-image charbonnier mean
        fdiff = fp - alpha[:, None]
        self.fusion_alpha = jnp.mean(jnp.sqrt(fdiff**2 + 1e-12), axis=(2, 3))

        # fusion laplacian (:236-255): unweighted pyramids
        ff = fp.reshape(b * L, h, w)
        fa = jnp.broadcast_to(alpha[:, None], (b, L, h, w)).reshape(b * L, h, w)
        self.lap_fused = _lap_pyramid_l1(ff, fa).reshape(b, L)

        # composition (:257-283): fused*fg + (1-fused)*bg vs image
        comp = (fp[..., None] * fg[:, None] +
                (1.0 - fp[..., None]) * bg[:, None])
        cdiff = comp - img[:, None]
        self.comp = jnp.mean(jnp.sqrt(cdiff**2 + 1e-12), axis=(2, 3, 4))

        # fused iou-prediction target (:285-297)
        fbin = (fp >= mask_threshold).astype(jnp.float32)
        abin = (alpha[:, None] >= mask_threshold).astype(jnp.float32)
        binter = jnp.sum(fbin * abin, axis=(2, 3))
        self.iou_gt = (binter + _EPS) / (jnp.sum(fbin, (2, 3)) +
                                         jnp.sum(abin, (2, 3)) - binter + _EPS)
        self.iou_sq = (iou_pred - self.iou_gt)**2

        # per-sample alpha area ratios for AssignLoss gating
        self.area_ratio = jnp.sum((alpha > 0).astype(jnp.float32),
                                  axis=(1, 2)) / float(h * w)
        # the reference's local_laplacian_loss multiplies alpha by the
        # trimap==128 weight BEFORE computing its gating ratio
        # (losses_matting.py:1253-1278) — the only Assign term that does
        self.area_ratio_weighted = jnp.sum(
            ((alpha > 0) & (wmask[:, 0] > 0)).astype(jnp.float32),
            axis=(1, 2)) / float(h * w)
        # iou-predict gating uses the THRESHOLDED alpha sum (:1589-1594)
        self.area_ratio_thresh = jnp.sum(abin[:, 0], axis=(1, 2)) / float(h * w)

        self.b, self.L = b, L


class _SAMMattingLossBase:
    """Shared __init__/packaging for the four stacks (weight names mirror the
    reference constructor args, including its 'gloabel' typo)."""

    def __init__(self,
                 global_pred_trimap_ce_loss_weight=1,
                 gloabel_pred_trimap_iou_loss_weight=1,
                 local_pred_alpha_loss_weight=1,
                 local_pred_laplacian_loss_weight=1,
                 fusion_pred_alpha_loss_weight=1,
                 fusion_pred_laplacian_loss_weight=1,
                 composition_loss_weight=1,
                 fused_pred_iou_predict_loss_weight=1,
                 mask_threshold=0.5):
        self.w_ce = global_pred_trimap_ce_loss_weight
        self.w_iou = gloabel_pred_trimap_iou_loss_weight
        self.w_local_alpha = local_pred_alpha_loss_weight
        self.w_local_lap = local_pred_laplacian_loss_weight
        self.w_fusion_alpha = fusion_pred_alpha_loss_weight
        self.w_fusion_lap = fusion_pred_laplacian_loss_weight
        self.w_comp = composition_loss_weight
        self.w_iou_pred = fused_pred_iou_predict_loss_weight
        self.mask_threshold = mask_threshold

    def _pack(self, ce, iou, local_alpha, local_lap, fusion_alpha, fusion_lap,
              comp, iou_pred):
        return {
            "global_pred_trimap_ce_loss": self.w_ce * ce,
            "gloabel_pred_trimap_iou_loss": self.w_iou * iou,
            "local_pred_alpha_loss": self.w_local_alpha * local_alpha,
            "local_pred_laplacian_loss": self.w_local_lap * local_lap,
            "fusion_pred_alpha_loss": self.w_fusion_alpha * fusion_alpha,
            "fusion_pred_laplacian_loss": self.w_fusion_lap * fusion_lap,
            "composition_loss": self.w_comp * comp,
            "fused_pred_iou_predict_loss": self.w_iou_pred * iou_pred,
        }


@LOSSES.register()
class SAMMattingOneLevelLoss(_SAMMattingLossBase):
    """Reference losses_matting.py:18-297 (single mask level)."""

    def __call__(self, images, preds, targets):
        t = _Terms(images, preds, targets, self.mask_threshold)
        return self._pack(
            ce=jnp.mean(t.ce),
            iou=jnp.mean(t.iou),
            local_alpha=jnp.sum(t.local_alpha_num) /
            (t.L * jnp.sum(t.wsum) + 1.0),
            local_lap=jnp.mean(t.lap_local),
            fusion_alpha=jnp.mean(t.fusion_alpha),
            fusion_lap=jnp.mean(t.lap_fused),
            comp=jnp.mean(t.comp),
            # reference divides by batch AND level count
            # (losses_matting.py fusion_iou_predict_loss: mse(sum)/B/L);
            # identical for the one-level case where L == 1
            iou_pred=jnp.sum(t.iou_sq) / t.b / t.L,
        )


@LOSSES.register()
class SAMMattingMultiLevelLoss(SAMMattingOneLevelLoss):
    """Reference losses_matting.py:299-607: every level supervised against
    the broadcast GT. Identical reductions to OneLevel once the level axis is
    folded in (the reference repeats GT over levels then takes the same
    global means; local_alpha divides by the repeated weight sum, which our
    ``t.L * wsum`` matches)."""


@LOSSES.register()
class SAMMattingMultiLevelIoUMaxLoss(_SAMMattingLossBase):
    """Reference losses_matting.py:609-920: per sample, supervise only the
    level whose thresholded fused pred maximises IoU with the GT mask."""

    def __call__(self, images, preds, targets):
        t = _Terms(images, preds, targets, self.mask_threshold)
        # selection ious (:946-957): union-only epsilon
        g, l, f, iou_pred = preds
        fp = _as_leveled(f, 5).astype(jnp.float32)[..., 0]
        alpha = targets[0]
        if alpha.ndim == 4:
            alpha = alpha[..., 0]
        fbin = (fp >= self.mask_threshold).astype(jnp.float32)
        abin = (alpha[:, None].astype(jnp.float32)
                >= self.mask_threshold).astype(jnp.float32)
        inter = jnp.sum(fbin * abin, axis=(2, 3))
        union = jnp.sum(fbin, (2, 3)) + jnp.sum(abin, (2, 3)) - inter + _EPS
        sel = jnp.argmax(inter / union, axis=1)                      # [b]

        pick = lambda x: jnp.take_along_axis(x, sel[:, None], axis=1)[:, 0]
        return self._pack(
            ce=jnp.mean(pick(t.ce)),
            iou=jnp.mean(pick(t.iou)),
            local_alpha=jnp.sum(pick(t.local_alpha_num)) /
            (jnp.sum(t.wsum) + 1.0),
            local_lap=jnp.mean(pick(t.lap_local)),
            fusion_alpha=jnp.mean(pick(t.fusion_alpha)),
            fusion_lap=jnp.mean(pick(t.lap_fused)),
            comp=jnp.mean(pick(t.comp)),
            iou_pred=jnp.sum(pick(t.iou_sq)) / t.b,
        )


@LOSSES.register()
class SAMMattingMultiLevelAssignLoss(_SAMMattingLossBase):
    """Reference losses_matting.py:922-1633: per-sample level gating by GT
    alpha area ratio; masked level mean then masked sample mean."""

    def __init__(self, *args,
                 idx_nums: int = 4,
                 area_ranges: Sequence[Sequence[float]] = ((0.04, 0.64),
                                                           (0.0, 0.04),
                                                           (0.01, 0.25),
                                                           (0.16, 1.0)),
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.idx_nums = idx_nums
        self.area_ranges = tuple(tuple(r) for r in area_ranges)
        assert len(self.area_ranges) == self.idx_nums

    def _masked_reduce(self, per_level, ratio):
        """per_level [b,L]; gate by ratio in each level's window, average
        over valid levels per sample, then over samples with >=1 valid."""
        lo = jnp.asarray([r[0] for r in self.area_ranges], jnp.float32)
        hi = jnp.asarray([r[1] for r in self.area_ranges], jnp.float32)
        valid = ((ratio[:, None] > lo[None]) &
                 (ratio[:, None] < hi[None])).astype(jnp.float32)   # [b,L]
        n_valid = jnp.sum(valid, axis=1)
        per_sample = jnp.sum(per_level * valid, axis=1) / jnp.maximum(
            n_valid, 1.0)
        n_samples = jnp.sum((n_valid > 0).astype(jnp.float32))
        return jnp.sum(per_sample) / jnp.maximum(n_samples, 1.0)

    def __call__(self, images, preds, targets):
        t = _Terms(images, preds, targets, self.mask_threshold)
        assert t.L == self.idx_nums, (t.L, self.idx_nums)
        # per-(b,L) local alpha with per-sample weight sums (:1160-1227)
        local_alpha = t.local_alpha_num / (t.wsum[:, None] + 1.0)
        r = t.area_ratio
        return self._pack(
            ce=self._masked_reduce(t.ce, r),
            iou=self._masked_reduce(t.iou, r),
            local_alpha=self._masked_reduce(local_alpha, r),
            local_lap=self._masked_reduce(t.lap_local,
                                          t.area_ratio_weighted),
            fusion_alpha=self._masked_reduce(t.fusion_alpha, r),
            fusion_lap=self._masked_reduce(t.lap_fused, r),
            comp=self._masked_reduce(t.comp, r),
            iou_pred=self._masked_reduce(t.iou_sq, t.area_ratio_thresh),
        )
