"""Human-matting task adapter (parity: reference
tools/human_matting_scripts.py — global/local/fusion loss stack and the
SAD/MAE/MSE/Grad/Conn eval meter)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_loss_fn(model, criterion_cfg) -> Callable:
    """criterion_cfg: dict name -> (ratio, loss). Losses are routed by name:
    Global* get (global_pred, trimap); Local* get (local_pred, alpha, trimap);
    Fusion* get (fused_pred, alpha); Composition gets (fused, alpha, image)."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            (g, l, f), new_vars = model.apply(variables, batch["image"],
                                              train, rngs=rngs,
                                              mutable=mutable)
        else:
            g, l, f = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        total = jnp.zeros((), jnp.float32)
        metrics = {}
        for name, (ratio, loss) in criterion_cfg.items():
            # "Gloabel" covers the reference's typo'd GloabelTrimapIouLoss
            if name.startswith(("Global", "Gloabel")):
                v = loss(g, batch["trimap"])
            elif name.startswith("Local"):
                v = loss(l, batch["alpha"], batch["trimap"])
            elif name.startswith("Composition"):
                v = loss(f, batch["alpha"], batch["image"])
            else:  # Fusion*
                v = loss(f, batch["alpha"])
            metrics[name] = v
            total = total + ratio * v
        return total, (metrics, new_vars)

    return loss_fn


def make_eval_fn(model) -> Callable:
    """SAD/MAE/MSE sums on the fused alpha (reference MattingEvalMeter:18;
    Grad/Conn are host-side and omitted from the jitted path)."""

    def eval_fn(params, state_vars, batch, rng, train):
        del rng, train
        variables = {"params": params, **state_vars}
        _, _, fused = model.apply(variables, batch["image"], False)
        pred = fused[..., 0].astype(jnp.float32)
        alpha = batch["alpha"].astype(jnp.float32)
        diff = pred - alpha
        return {
            "sad_sum": jnp.sum(jnp.abs(diff)) / 1000.0,
            "mae_sum": jnp.sum(jnp.mean(jnp.abs(diff), axis=(1, 2))),
            "mse_sum": jnp.sum(jnp.mean(diff**2, axis=(1, 2))),
            "n": jnp.asarray(pred.shape[0], jnp.float32),
        }

    return eval_fn


def make_evaluate():

    def evaluate(eval_step, params, state_vars, loader, shard_fn) -> dict:
        sad = mae = mse = n = 0.0
        for batch in loader:
            m = eval_step(params, state_vars, shard_fn(batch),
                          jax.random.PRNGKey(0))
            sad += float(m["sad_sum"])
            mae += float(m["mae_sum"])
            mse += float(m["mse_sum"])
            n += float(m["n"])
        n = max(n, 1.0)
        return {"sad": sad / n, "mae": mae / n, "mse": mse / n,
                "key_metric": -sad / n}

    return evaluate
