"""Text-recognition losses (parity: reference
simpleAICV/text_recognition/losses.py — CTCLoss (with optional focal
weighting, per-target-length normalisation) and ACELoss).

CTC itself is `optax.ctc_loss` — a native XLA implementation, replacing
torch.nn.CTCLoss."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..core.registry import LOSSES

__all__ = ["CTCLoss", "ACELoss"]


@LOSSES.register()
class CTCLoss:

    def __init__(self, blank_index: int = 0, use_focal_weight: bool = False,
                 gamma: float = 2.0):
        self.blank_index = blank_index
        self.use_focal_weight = use_focal_weight
        self.gamma = gamma

    def __call__(self, preds, targets, target_lengths):
        """preds: [B,T,C] logits; targets: [B,N] int (0-padded);
        target_lengths: [B]."""
        b, t, c = preds.shape
        n = targets.shape[1]
        logit_paddings = jnp.zeros((b, t), jnp.float32)
        pos = jnp.arange(n)[None, :]
        label_paddings = (pos >= target_lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(preds.astype(jnp.float32), logit_paddings,
                                 targets.astype(jnp.int32), label_paddings,
                                 blank_id=self.blank_index)
        # torch CTCLoss(zero_infinity=True) parity: infeasible alignments
        # (target longer than the time axis allows) contribute 0
        per_seq = jnp.where(jnp.isfinite(per_seq) & (per_seq < 1e5), per_seq,
                            0.0)
        if self.use_focal_weight:
            pt = jnp.exp(-per_seq)
            per_seq = jnp.power(1.0 - pt, self.gamma) * per_seq
        per_seq = per_seq / jnp.clip(target_lengths.astype(jnp.float32), 1.0,
                                     None) / b
        return jnp.sum(per_seq)


@LOSSES.register()
class ACELoss:
    """Aggregation cross-entropy (reference losses.py:61-108): match the mean
    predicted class distribution to the empirical target distribution."""

    def __init__(self, blank_index: int = 0):
        self.blank_index = blank_index

    def __call__(self, preds, targets, target_lengths):
        """preds [B,T,C]; targets [B,N] (0 = pad/blank)."""
        b, t, c = preds.shape
        p = jax.nn.softmax(preds.astype(jnp.float32), axis=-1)
        p_mean = jnp.mean(p, axis=1)  # [B,C]
        counts = jax.vmap(
            lambda tg: jnp.bincount(jnp.clip(tg, 0, c - 1), length=c))(
                targets.astype(jnp.int32)).astype(jnp.float32)
        # blank absorbs the unlabelled time steps
        counts = counts.at[:, self.blank_index].set(0.0)
        blank_count = t - jnp.sum(counts, axis=-1)
        counts = counts.at[:, self.blank_index].set(blank_count)
        target_dist = counts / t
        loss = -jnp.sum(target_dist * jnp.log(jnp.clip(p_mean, 1e-10, None)),
                        axis=-1)
        return jnp.mean(loss)
