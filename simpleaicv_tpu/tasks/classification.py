"""Classification task adapter for the SPMD engine.

Replaces the reference's train_classification / test_classification loops
(tools/scripts.py:28-267) — the engine owns the loop; this module owns the
task-specific loss/eval functions and metric accumulation.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.meters import AccMeter


def make_loss_fn(model, criterion, moe_aux_weight: float = 0.01) -> Callable:
    """loss_fn(params, state_vars, batch, rng, train) for the engine.

    MoE backbones (parallel/moe.py) sow per-layer load-balance losses into
    the ``moe_losses`` collection; training collects them and adds
    ``moe_aux_weight *`` their sum to the task loss (configs override via
    ``config.moe_aux_weight`` — trainer.py passes it through). Dense models
    sow nothing, so the term is identically zero for them.
    """
    from ..parallel.moe import moe_aux_loss

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        rngs = {"dropout": rng}
        if train:
            mutable = [k for k in state_vars] + ["moe_losses"]
            out, new_vars = model.apply(variables, batch["image"], train,
                                        rngs=rngs, mutable=mutable)
            aux = moe_aux_loss(new_vars)
            new_vars = {k: v for k, v in new_vars.items()
                        if k != "moe_losses"}
            loss = criterion(out, batch["label"]) + moe_aux_weight * aux
        else:
            out = model.apply(variables, batch["image"], False)
            new_vars = state_vars
            loss = criterion(out, batch["label"])
        return loss, ({}, new_vars)

    return loss_fn


def make_eval_fn(model) -> Callable:
    """Returns jittable eval step computing top-1/top-5 correct counts.

    Parity: tools/scripts.py:66-93 (accuracy(output, target, topk=(1,5))).
    """

    def eval_fn(params, state_vars, batch, rng, train):
        del rng, train
        variables = {"params": params, **state_vars}
        logits = model.apply(variables, batch["image"], False)
        labels = batch["label"]
        top5 = jnp.argsort(logits, axis=-1)[:, -5:]
        correct1 = (top5[:, -1] == labels).astype(jnp.float32)
        correct5 = jnp.any(top5 == labels[:, None], axis=-1).astype(jnp.float32)
        # mask out padding examples (label < 0)
        valid = (labels >= 0).astype(jnp.float32)
        return {
            "acc1_correct": jnp.sum(correct1 * valid),
            "acc5_correct": jnp.sum(correct5 * valid),
            "n": jnp.sum(valid),
        }

    return eval_fn


def evaluate(eval_step, params, state_vars, loader, shard_fn) -> dict:
    """Host loop over the eval loader -> {'acc1': %, 'acc5': %}."""
    meter = AccMeter()
    for batch in loader:
        batch = shard_fn(batch)
        m = eval_step(params, state_vars, batch,
                      jax.random.PRNGKey(0))
        meter.update(float(m["acc1_correct"]), float(m["acc5_correct"]),
                     float(m["n"]))
    acc1, acc5 = meter.compute()
    return {"acc1": acc1, "acc5": acc5, "key_metric": acc1}
