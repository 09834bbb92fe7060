"""Distillation losses (parity: reference simpleAICV/distillation/losses.py:
CELoss:14, OneHotLabelCELoss:29, KDLoss:43 (KL with temperature T, scaled by
T^2), DMLLoss:62 (symmetric KL), L2Loss:91 (feature MSE))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["KDLoss", "DMLLoss", "L2Loss"]


def _clamped_probs(pred, T):
    p = jax.nn.softmax(pred.astype(jnp.float32) / T, -1)
    return jnp.clip(p, 1e-4, 1.0 - 1e-4)


def _kl_batchmean(log_s, p_t):
    """torch F.kl_div(log_s, p_t, reduction='batchmean')."""
    return jnp.sum(p_t * (jnp.log(p_t) - log_s)) / log_s.shape[0]


@LOSSES.register()
class KDLoss:
    """KL(teacher || student) * T^2, with the reference's prob clamping
    (simpleAICV/distillation/losses.py:43-59)."""

    def __init__(self, T: float = 1.0):
        self.T = T

    def __call__(self, stu_pred, tea_pred):
        log_s = jnp.log(_clamped_probs(stu_pred, self.T))
        p_t = _clamped_probs(tea_pred, self.T)
        return _kl_batchmean(log_s, p_t) * self.T * self.T


@LOSSES.register()
class DMLLoss:
    """Deep mutual learning: mean of the two KD directions
    (simpleAICV/distillation/losses.py:62-88)."""

    def __init__(self, T: float = 1.0):
        self.T = T

    def __call__(self, stu_pred, tea_pred):
        kd = KDLoss(self.T)
        return (kd(stu_pred, tea_pred) + kd(tea_pred, stu_pred)) / 2.0


@LOSSES.register()
class L2Loss:

    def __call__(self, stu_feature, tea_feature):
        diff = stu_feature.astype(jnp.float32) - tea_feature.astype(jnp.float32)
        return jnp.mean(jnp.square(diff))
