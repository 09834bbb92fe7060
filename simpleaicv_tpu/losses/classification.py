"""Classification losses (parity: reference
simpleAICV/classification/losses.py:14-127). All are pure jittable callables
``loss(pred_logits, label) -> f32 scalar``, computed in f32 regardless of the
model's compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["CELoss", "FocalCELoss", "LabelSmoothCELoss", "OneHotLabelCELoss",
           "SemanticSoftmaxLoss"]


def _log_softmax(pred):
    return jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)


@LOSSES.register()
class CELoss:
    """Mean cross-entropy with integer labels."""

    def __call__(self, pred, label):
        logp = _log_softmax(pred)
        nll = -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        return jnp.mean(nll)


@LOSSES.register()
class FocalCELoss:

    def __init__(self, gamma: float = 2.0):
        self.gamma = gamma

    def __call__(self, pred, label):
        logp = _log_softmax(pred)
        p = jnp.exp(logp)
        one_hot = jax.nn.one_hot(label, pred.shape[-1], dtype=jnp.float32)
        pt = jnp.where(one_hot == 1.0, p, 1.0 - p)
        loss = jnp.power(1.0 - pt, self.gamma) * (-logp) * one_hot
        return jnp.mean(jnp.sum(loss, axis=-1))


@LOSSES.register()
class LabelSmoothCELoss:

    def __init__(self, smoothing: float = 0.1):
        self.smoothing = smoothing

    def __call__(self, pred, label):
        logp = _log_softmax(pred)
        n = pred.shape[-1]
        one_hot = jax.nn.one_hot(label, n, dtype=jnp.float32)
        smoothed = (1.0 - self.smoothing) * one_hot + self.smoothing / n
        return jnp.mean(jnp.sum(-smoothed * logp, axis=-1))


@LOSSES.register()
class OneHotLabelCELoss:
    """CE with one-hot / soft labels (used by mixup-cutmix training)."""

    def __call__(self, pred, target):
        logp = _log_softmax(pred)
        return jnp.mean(jnp.sum(-target.astype(jnp.float32) * logp, axis=-1))


@LOSSES.register()
class SemanticSoftmaxLoss:
    """ImageNet-21K hierarchical semantic softmax (reference losses.py:86-127).

    ``semantic_outputs`` is a list of per-hierarchy logits; ``semantic_labels``
    is [B, n_hierarchies] with -1 for "not present at this level".
    """

    def __init__(self, normalization_factor_list, smoothing: float = 0.1):
        self.normalization_factor_list = normalization_factor_list
        self.smoothing = smoothing

    def __call__(self, semantic_outputs, semantic_labels):
        total = jnp.zeros((), jnp.float32)
        for i, out_i in enumerate(semantic_outputs):
            labels_i = semantic_labels[:, i]
            valid = (labels_i >= 0).astype(jnp.float32)
            labels_safe = jnp.maximum(labels_i, 0)
            n = out_i.shape[-1]
            logp = _log_softmax(out_i)
            one_hot = jax.nn.one_hot(labels_safe, n, dtype=jnp.float32)
            smoothed = (1.0 - self.smoothing) * one_hot + self.smoothing / n
            ce = jnp.sum(-smoothed * logp, axis=-1) * valid
            total = total + jnp.mean(ce) * self.normalization_factor_list[i]
        return total
