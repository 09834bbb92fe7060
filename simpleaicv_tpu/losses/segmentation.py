"""Semantic-segmentation losses (parity: reference
simpleAICV/semantic_segmentation/losses.py:16-232: CE / multi-class BCE / IoU /
Dice / Lovasz, all with optional ignore_index).

TPU-first: the reference filters ignored pixels (dynamic shapes); here a
validity mask weights the reductions — identical values, fixed shapes. Our
logits are NHWC [b,h,w,c] (no permute needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["SegCELoss", "SegMultiClassBCELoss", "SegIoULoss", "SegDiceLoss",
           "SegLovaszLoss"]


def _flat_probs_mask(pred, label, ignore_index, logit="softmax"):
    c = pred.shape[-1]
    pred = pred.reshape(-1, c).astype(jnp.float32)
    label = label.reshape(-1).astype(jnp.int32)
    if logit == "softmax":
        p = jax.nn.softmax(pred, axis=-1)
    else:
        p = jax.nn.sigmoid(pred)
    p = jnp.clip(p, 1e-4, 1.0 - 1e-4)
    if ignore_index is not None:
        valid = (label >= 0) & (label != ignore_index)
    else:
        valid = jnp.ones_like(label, bool)
    one_hot = jax.nn.one_hot(jnp.clip(label, 0, c - 1), c,
                             dtype=jnp.float32)
    return p, one_hot, valid.astype(jnp.float32), label


@LOSSES.register()
class SegCELoss:

    def __init__(self, ignore_index=None):
        self.ignore_index = ignore_index

    def __call__(self, pred, label):
        p, oh, valid, _ = _flat_probs_mask(pred, label, self.ignore_index)
        loss = jnp.sum(-jnp.log(p) * oh, axis=-1)
        return jnp.sum(loss * valid) / jnp.clip(jnp.sum(valid), 1.0, None)


@LOSSES.register()
class SegMultiClassBCELoss:

    def __init__(self, ignore_index=None):
        self.ignore_index = ignore_index

    def __call__(self, pred, label):
        p, oh, valid, _ = _flat_probs_mask(pred, label, self.ignore_index,
                                           "sigmoid")
        bce = -(oh * jnp.log(p) + (1.0 - oh) * jnp.log(1.0 - p))
        bce = jnp.mean(bce, axis=-1)
        return jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), 1.0, None)


@LOSSES.register()
class SegIoULoss:

    def __init__(self, logit_type="softmax", ignore_index=None):
        self.logit_type = logit_type
        self.ignore_index = ignore_index

    def __call__(self, pred, label):
        p, oh, valid, _ = _flat_probs_mask(pred, label, self.ignore_index,
                                           self.logit_type)
        inter = jnp.sum(p * oh, axis=-1)
        union = jnp.clip(jnp.sum(p, -1) + jnp.sum(oh, -1) - inter, 1e-4, None)
        loss = 1.0 - inter / union
        return jnp.sum(loss * valid) / jnp.clip(jnp.sum(valid), 1.0, None)


@LOSSES.register()
class SegDiceLoss:

    def __init__(self, logit_type="softmax", ignore_index=None):
        self.logit_type = logit_type
        self.ignore_index = ignore_index

    def __call__(self, pred, label):
        p, oh, valid, _ = _flat_probs_mask(pred, label, self.ignore_index,
                                           self.logit_type)
        inter = jnp.sum(p * oh, axis=-1)
        dice = 1.0 - (2 * inter + 1e-4) / (jnp.sum(p, -1) + jnp.sum(oh, -1)
                                           + 1e-4)
        return jnp.sum(dice * valid) / jnp.clip(jnp.sum(valid), 1.0, None)


@LOSSES.register()
class SegLovaszLoss:
    """Sigmoid Lovasz-hinge-style loss over classes 1..C-1 (reference
    losses.py:180-232). Ignored pixels sort last with error −1 and contribute
    zero via the sorted validity mask; prefix cumsums over valid pixels are
    unchanged, so values match the reference's filtered computation."""

    def __init__(self, ignore_index=None):
        self.ignore_index = ignore_index

    def __call__(self, pred, label):
        p, _, valid, label_flat = _flat_probs_mask(pred, label,
                                                   self.ignore_index,
                                                   "sigmoid")
        c = p.shape[-1]
        total = jnp.zeros((), jnp.float32)
        count = jnp.zeros((), jnp.float32)
        for class_idx in range(1, c):
            mask = ((label_flat == class_idx) & (valid > 0)).astype(
                jnp.float32)
            present = jnp.sum(mask) > 0
            errors = jnp.abs(mask - p[:, class_idx])
            errors = jnp.where(valid > 0, errors, -1.0)
            order = jnp.argsort(-errors)
            errors_sorted = errors[order]
            mask_sorted = mask[order]
            valid_sorted = valid[order]
            gts = jnp.sum(mask_sorted)
            inter = gts - jnp.cumsum(mask_sorted)
            union = gts + jnp.cumsum((1.0 - mask_sorted) * valid_sorted)
            jaccard = 1.0 - inter / jnp.clip(union, 1e-4, None)
            grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
            loss = jnp.sum(errors_sorted * valid_sorted * grad)
            total = total + jnp.where(present, loss, 0.0)
            count = count + present.astype(jnp.float32)
        return total / jnp.clip(count, 1.0, None)


@LOSSES.register()
class SegCombinedLoss:
    """Weighted sum of registered segmentation losses — mirrors the
    reference's per-config loss_list/loss_ratio composition (e.g. face/human
    parsing trains CELoss + IoULoss, reference 11/12.*_parsing_training
    train_config.py loss_list)."""

    def __init__(self, loss_cfg):
        """loss_cfg: list of (name, ratio, kwargs) tuples."""
        from ..core.registry import LOSSES as _L
        self.parts = [(name, ratio, _L.create(name, **kw))
                      for name, ratio, kw in loss_cfg]

    def __call__(self, pred, label):
        total = 0.0
        for _, ratio, loss in self.parts:
            total = total + ratio * loss(pred, label)
        return total
