"""MAE pretraining losses (parity: reference
simpleAICV/masked_image_modeling/losses.py:11-38 — masked per-patch MSE/L1)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["MAEMSELoss", "MAEL1Loss"]


@LOSSES.register()
class MAEMSELoss:

    def __call__(self, pred, label, mask):
        loss = (pred.astype(jnp.float32) - label.astype(jnp.float32))**2
        loss = jnp.mean(loss, axis=-1)
        return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-4)


@LOSSES.register()
class MAEL1Loss:

    def __call__(self, pred, label, mask):
        loss = jnp.abs(pred.astype(jnp.float32) - label.astype(jnp.float32))
        return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-4)
