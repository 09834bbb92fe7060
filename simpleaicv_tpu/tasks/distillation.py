"""Distillation task adapter (parity: reference tools/scripts.py:283-452
train/test_distill_classification).

``config.loss_list`` mirrors the reference: a list of dicts with 'loss_name',
'loss_ratio' and per-loss params; losses taking (stu, tea) vs (stu, label) are
routed by name, as the reference's loop does.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..core.registry import LOSSES


_LABEL_LOSSES = {"CELoss", "OneHotLabelCELoss", "LabelSmoothCELoss",
                 "FocalCELoss"}


def make_loss_fn(model, criterion_list) -> Callable:
    """criterion_list: [(name, ratio, callable), ...]."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if mutable:
            (tea_out, stu_out), new_vars = model.apply(
                variables, batch["image"], train, rngs=rngs, mutable=mutable)
        else:
            tea_out, stu_out = model.apply(variables, batch["image"], train,
                                           rngs=rngs)
            new_vars = state_vars
        total = jnp.zeros((), jnp.float32)
        metrics = {}
        for name, ratio, loss in criterion_list:
            if name in _LABEL_LOSSES:
                v = loss(stu_out, batch["label"])
            else:
                v = loss(stu_out, tea_out)
            metrics[name] = v
            total = total + ratio * v
        return total, (metrics, new_vars)

    return loss_fn


def build_criterion_list(loss_list):
    """From reference-style config.loss_list dicts."""
    out = []
    for item in loss_list:
        name = item["loss_name"]
        ratio = item.get("loss_ratio", 1.0)
        params = {k: v for k, v in item.items()
                  if k not in ("loss_name", "loss_ratio")}
        out.append((name, ratio, LOSSES.create(name, **params)))
    return out
