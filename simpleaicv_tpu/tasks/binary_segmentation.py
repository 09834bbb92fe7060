"""Binary-segmentation task adapter shared by salient-object detection and the
per-pixel heads of matting (parity: reference
tools/salient_object_detection_scripts.py / human_matting_scripts.py —
multi-loss sum, iou/precision/recall/f-squared-beta eval meter)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_loss_fn(model, criterion_list: Sequence) -> Callable:
    """criterion_list: [(name, ratio, loss_callable(pred, mask)), ...]."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            pred, new_vars = model.apply(variables, batch["image"], train,
                                         rngs=rngs, mutable=mutable)
        else:
            pred = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        total = jnp.zeros((), jnp.float32)
        metrics = {}
        for name, ratio, loss in criterion_list:
            v = loss(pred, batch["mask"])
            metrics[name] = v
            total = total + ratio * v
        return total, (metrics, new_vars)

    return loss_fn


def make_eval_fn(model, threshold: float = 0.5) -> Callable:
    """Binary iou/precision/recall sums (reference EvalMeter:16)."""

    def eval_fn(params, state_vars, batch, rng, train):
        del rng, train
        variables = {"params": params, **state_vars}
        pred = model.apply(variables, batch["image"], False)
        p = (pred[..., 0] > threshold).astype(jnp.float32)
        y = (batch["mask"] > threshold).astype(jnp.float32)
        inter = jnp.sum(p * y, axis=(1, 2))
        union = jnp.sum(p, (1, 2)) + jnp.sum(y, (1, 2)) - inter
        return {
            "iou_sum": jnp.sum(inter / jnp.clip(union, 1e-4, None)),
            "precision_sum": jnp.sum(
                inter / jnp.clip(jnp.sum(p, (1, 2)), 1e-4, None)),
            "recall_sum": jnp.sum(
                inter / jnp.clip(jnp.sum(y, (1, 2)), 1e-4, None)),
            "n": jnp.asarray(p.shape[0], jnp.float32),
        }

    return eval_fn


def make_evaluate(beta_sq: float = 0.3):

    def evaluate(eval_step, params, state_vars, loader, shard_fn) -> dict:
        iou = prec = rec = n = 0.0
        for batch in loader:
            m = eval_step(params, state_vars, shard_fn(batch),
                          jax.random.PRNGKey(0))
            iou += float(m["iou_sum"])
            prec += float(m["precision_sum"])
            rec += float(m["recall_sum"])
            n += float(m["n"])
        n = max(n, 1.0)
        p, r = prec / n, rec / n
        f = (1 + beta_sq) * p * r / max(beta_sq * p + r, 1e-4)
        return {"miou": iou / n, "precision": p, "recall": r,
                "f_squared_beta": f, "key_metric": iou / n}

    return evaluate
