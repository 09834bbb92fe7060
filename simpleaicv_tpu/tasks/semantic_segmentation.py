"""Semantic-segmentation task adapter (parity: reference
tools/scripts.py:1053-1427 — train loop + histogram mIoU/precision/recall/dice
eval with ignore_index and padded-canvas exclusion)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_loss_fn(model, criterion) -> Callable:

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            out, new_vars = model.apply(variables, batch["image"], train,
                                        rngs=rngs, mutable=mutable)
        else:
            out = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        loss = criterion(out, batch["mask"])
        return loss, ({}, new_vars)

    return loss_fn


def make_eval_fn(model, num_classes: int, ignore_index=255) -> Callable:
    """Jitted per-batch confusion accumulators: intersect/pred/gt/union areas
    per class. The padded canvas region carries ignore_index in the mask, so
    it is excluded exactly like the reference's size-cropping."""

    def eval_fn(params, state_vars, batch, rng, train):
        del rng, train
        variables = {"params": params, **state_vars}
        logits = model.apply(variables, batch["image"], False)
        pred = jnp.argmax(logits, axis=-1).reshape(-1)
        mask = batch["mask"].reshape(-1).astype(jnp.int32)
        valid = mask != ignore_index if ignore_index is not None else \
            jnp.ones_like(mask, bool)

        def hist(x, weights):
            return jnp.bincount(jnp.clip(x, 0, num_classes - 1),
                                weights=weights, length=num_classes)

        w = valid.astype(jnp.float32)
        inter_w = w * (pred == mask).astype(jnp.float32)
        area_intersect = hist(pred, inter_w)
        area_pred = hist(pred, w)
        area_gt = hist(mask, w)
        return {"area_intersect": area_intersect, "area_pred": area_pred,
                "area_gt": area_gt}

    return eval_fn


def make_evaluate(num_classes: int, ignore_index=255):

    def evaluate(eval_step, params, state_vars, loader, shard_fn) -> dict:
        tot_i = np.zeros(num_classes)
        tot_p = np.zeros(num_classes)
        tot_g = np.zeros(num_classes)
        for batch in loader:
            m = eval_step(params, state_vars, shard_fn(batch),
                          jax.random.PRNGKey(0))
            tot_i += np.asarray(m["area_intersect"])
            tot_p += np.asarray(m["area_pred"])
            tot_g += np.asarray(m["area_gt"])
        union = tot_p + tot_g - tot_i
        present = tot_g > 0
        iou = np.where(union > 0, tot_i / np.clip(union, 1e-9, None), 0.0)
        precision = np.where(tot_p > 0, tot_i / np.clip(tot_p, 1e-9, None), 0)
        recall = np.where(tot_g > 0, tot_i / np.clip(tot_g, 1e-9, None), 0)
        dice = np.where(tot_p + tot_g > 0,
                        2 * tot_i / np.clip(tot_p + tot_g, 1e-9, None), 0)
        miou = float(iou[present].mean()) * 100 if present.any() else 0.0
        return {
            "mean_iou": miou,
            "mean_precision": float(precision[present].mean()) * 100
            if present.any() else 0.0,
            "mean_recall": float(recall[present].mean()) * 100
            if present.any() else 0.0,
            "mean_dice": float(dice[present].mean()) * 100
            if present.any() else 0.0,
            "key_metric": miou,
        }

    return evaluate
