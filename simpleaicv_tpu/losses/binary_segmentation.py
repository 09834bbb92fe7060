"""Binary-segmentation losses for salient-object detection (parity: reference
simpleAICV/salient_object_detection/losses.py:16-141 — BCE / OHEM-BCE /
BCE-IoU / BCE-Dice on sigmoid 1-channel preds [b,h,w,1] vs labels [b,h,w])."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["BinaryBCELoss", "OHEMBCELoss", "BCEIouloss", "BCEDiceLoss"]


def _flat(pred, label):
    p = jnp.clip(pred.astype(jnp.float32).reshape(-1), 1e-4, 1.0 - 1e-4)
    return p, label.astype(jnp.float32).reshape(-1)


@LOSSES.register()
class BinaryBCELoss:

    def __call__(self, pred, label):
        p, y = _flat(pred, label)
        return jnp.mean(-(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p)))


@LOSSES.register()
class OHEMBCELoss:

    def __init__(self, negative_ratio: float = 1.5):
        self.negative_ratio = negative_ratio

    def __call__(self, pred, label):
        p, y = _flat(pred, label)
        pos = (y > 0).astype(jnp.float32)
        n_pos = jnp.sum(pos)
        n_neg = jnp.minimum(jnp.sum(1.0 - pos), n_pos * self.negative_ratio)
        loss = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        pos_loss = jnp.sum(loss * pos)
        neg_sorted = jnp.sort(loss * (1.0 - pos))[::-1]
        rank = jnp.arange(neg_sorted.shape[0], dtype=jnp.float32)
        neg_loss = jnp.sum(jnp.where(rank < n_neg, neg_sorted, 0.0))
        return (pos_loss + neg_loss) / (n_pos + n_neg + 1e-4)


@LOSSES.register()
class BCEIouloss:

    def __init__(self, smooth: float = 1e-4):
        self.smooth = smooth

    def __call__(self, pred, label):
        b = pred.shape[0]
        p = jnp.clip(pred.astype(jnp.float32).reshape(b, -1), 1e-4,
                     1.0 - 1e-4)
        y = label.astype(jnp.float32).reshape(b, -1)
        inter = jnp.sum(p * y, axis=1)
        iou = 1.0 - (inter + self.smooth) / (
            jnp.sum(p, 1) + jnp.sum(y, 1) - inter + self.smooth)
        return jnp.mean(iou)


@LOSSES.register()
class BCEDiceLoss:

    def __init__(self, smooth: float = 1e-4):
        self.smooth = smooth

    def __call__(self, pred, label):
        b = pred.shape[0]
        p = jnp.clip(pred.astype(jnp.float32).reshape(b, -1), 1e-4,
                     1.0 - 1e-4)
        y = label.astype(jnp.float32).reshape(b, -1)
        inter = jnp.sum(p * y, axis=1)
        dice = 1.0 - (2 * inter + self.smooth) / (
            jnp.sum(p, 1) + jnp.sum(y, 1) + self.smooth)
        return jnp.mean(dice)
