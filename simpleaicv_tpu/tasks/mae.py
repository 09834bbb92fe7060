"""MAE self-supervised task adapter (parity: reference
tools/scripts.py:1748 train_mae_self_supervised_learning — loss-only)."""

from __future__ import annotations

from typing import Callable


def make_loss_fn(model, criterion) -> Callable:

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        rngs = {"dropout": rng, "mask": rng}
        pred, mask = model.apply(variables, batch["image"], train, rngs=rngs)
        target = model.images_to_patch(batch["image"])
        loss = criterion(pred, target, mask)
        return loss, ({}, state_vars)

    return loss_fn
