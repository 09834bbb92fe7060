"""DBNet loss (parity: reference simpleAICV/text_detection/losses.py:17-127 —
OHEM BCE on probability map (neg:pos 3:1), L1 threshold loss, dice binary
loss with differentiable binarisation 1/(1+exp(-k(p-t)))).

TPU-first: OHEM's dynamic top-k becomes sort + rank-mask (fixed shapes)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["DBNetLoss"]


@LOSSES.register()
class DBNetLoss:

    def __init__(self, probability_weight=1.0, threshold_weight=5.0,
                 binary_weight=1.0, negative_ratio=3.0, k=50.0):
        self.probability_weight = probability_weight
        self.threshold_weight = threshold_weight
        self.binary_weight = binary_weight
        self.negative_ratio = negative_ratio
        self.k = k

    def __call__(self, preds, shapes):
        prob = preds[..., 0].astype(jnp.float32)
        thresh = preds[..., 1].astype(jnp.float32)
        binary = 1.0 / (1.0 + jnp.exp(-self.k * (prob - thresh)))
        prob = jnp.clip(prob, 1e-4, 1.0 - 1e-4)

        p_mask = shapes["probability_mask"].astype(jnp.float32)
        p_ign = shapes["probability_ignore_mask"].astype(jnp.float32)
        t_mask = shapes["threshold_mask"].astype(jnp.float32)
        t_ign = shapes["threshold_ignore_mask"].astype(jnp.float32)

        # --- OHEM BCE (probability map) ---
        positive = p_mask * p_ign
        negative = (1.0 - p_mask) * p_ign
        n_pos = jnp.sum(positive)
        n_neg = jnp.minimum(jnp.sum(negative), n_pos * self.negative_ratio)

        bce = -(p_mask * jnp.log(prob) +
                (1.0 - p_mask) * jnp.log(1.0 - prob))
        pos_loss = jnp.sum(bce * positive)
        neg_flat = (bce * negative).reshape(-1)
        neg_sorted = jnp.sort(neg_flat)[::-1]
        rank = jnp.arange(neg_sorted.shape[0], dtype=jnp.float32)
        neg_loss = jnp.sum(jnp.where(rank < n_neg, neg_sorted, 0.0))
        prob_loss = jnp.where(
            n_pos + n_neg > 0,
            (pos_loss + neg_loss) / jnp.clip(n_pos + n_neg, 1.0, None), 0.0)

        # --- threshold L1 ---
        t_den = jnp.sum(t_ign)
        thresh_loss = jnp.where(
            t_den > 0,
            jnp.sum(jnp.abs(thresh - t_mask) * t_ign) /
            jnp.clip(t_den, 1.0, None), 0.0)

        # --- binary dice ---
        inter = jnp.sum(binary * p_mask * p_ign)
        union = jnp.sum(binary * p_ign) + jnp.sum(p_mask * p_ign)
        binary_loss = jnp.where((n_pos > 0) & (inter > 0) & (union > 0),
                                1.0 - 2.0 * inter / jnp.clip(union, 1e-8,
                                                             None), 0.0)

        return {
            "probability_map_loss": self.probability_weight * prob_loss,
            "threshold_map_loss": self.threshold_weight * thresh_loss,
            "binary_map_loss": self.binary_weight * binary_loss,
        }
