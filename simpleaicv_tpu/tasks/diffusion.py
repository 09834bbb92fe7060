"""Diffusion task adapter (parity: reference
tools/diffusion_scripts.py:19-349 — DDPM training with optional conditional
class-label dropout, sampler-based generation).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_loss_fn(model, criterion, trainer,
                 num_classes: Optional[int] = None,
                 class_label_drop_prob: float = 0.0) -> Callable:
    """criterion(pred_noise, noise) — MSE/L1; trainer = DDPMTrainer."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        rng, drop_rng, t_rng = jax.random.split(rng, 3)

        class_label = batch.get("label") if num_classes else None
        if class_label is not None and class_label_drop_prob > 0.0:
            # conditional training with label dropout -> label 0 token
            drop = jax.random.bernoulli(drop_rng, class_label_drop_prob,
                                        class_label.shape)
            class_label = jnp.where(drop, 0, class_label + 1)
        elif class_label is not None:
            class_label = class_label + 1

        def apply_fn(x_noisy, t, cl):
            return model.apply(variables, x_noisy, t, cl, train,
                               rngs={"dropout": rng})

        pred, noise = trainer(apply_fn, batch["image"], t_rng, class_label)
        loss = criterion(pred, noise)
        return loss, ({}, state_vars)

    return loss_fn


def make_generate_fn(model, sampler, shape, num_classes=None):
    """Jitted image generation with the DDPM/DDIM sampler scan."""

    def generate(params, state_vars, rng, class_label=None):
        variables = {"params": params, **state_vars}

        def apply_fn(x, t, cl):
            return model.apply(variables, x, t, cl, False)

        return sampler(apply_fn, shape, rng, class_label)

    return jax.jit(generate)


class MSELoss:
    """Parity: reference simpleAICV/diffusion_model/losses.py MSELoss."""

    def __call__(self, pred, label):
        return jnp.mean((pred.astype(jnp.float32) -
                         label.astype(jnp.float32))**2)


class L1Loss:

    def __call__(self, pred, label):
        return jnp.mean(jnp.abs(pred.astype(jnp.float32) -
                                label.astype(jnp.float32)))
