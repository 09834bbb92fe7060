"""The single SPMD train/eval engine.

One engine replaces the reference's 26 per-task DDP drivers and ~10 copy-paste
epoch loops (reference tools/train_*.py + tools/*_scripts.py; canonical loop
tools/scripts.py:108-267). Per-task behaviour is injected as a ``loss_fn``;
everything else — SPMD gradient averaging, gradient accumulation, NaN/Inf batch
skipping, EMA, LR scheduling, bf16 — is shared and fused into ONE jitted step.

Reference-feature mapping (see SURVEY.md §2.4/§2.5):
  * DDP allreduce of grads               -> jit over batch sharded on mesh axis
    ('data','fsdp'); the mean-loss grad *is* the global grad (XLA psum).
  * accumulation_steps + no_sync()       -> `lax.scan` over micro-batches; one
    grad reduction total (tools/scripts.py:137-175).
  * NaN/Inf skip agreed across ranks     -> global finiteness check of loss +
    grads, `lax.cond` on the update (tools/scripts.py:127-198). SPMD makes the
    agreement automatic — no flag allreduce, no barrier.
  * SyncBatchNorm                        -> batch-stat reduction happens on the
    global (sharded) batch inside jit, so BN is always "sync" (free).
  * AMP fp16 + GradScaler                -> bf16 compute / f32 params & optim;
    TPUs need no loss scaling.
  * EMA (tools/utils.py:136-163)         -> fused tree-map in the same step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated
from .ema import ema_update

# loss_fn(params, state_vars, batch, rng, train) ->
#     (loss: f32 scalar, (metrics: dict, new_state_vars))
LossFn = Callable[..., Any]


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    state_vars: Any  # non-trainable collections (batch_stats, ...)
    opt_state: Any
    ema_params: Any  # None when EMA disabled


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    accumulation_steps: int = 1
    use_ema: bool = False
    ema_decay: float = 0.9999
    skip_non_finite: bool = True
    # gradient clipping (reference tools/scripts.py:204-219: clip_grad_value_
    # then clip_grad_norm_ when the config sets them; DETR configs use
    # clip_max_norm=0.1). 0 disables.
    clip_grad_value: float = 0.0
    clip_max_norm: float = 0.0


def _tree_finite(tree) -> jnp.ndarray:
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.inexact)]
    if not leaves:
        return jnp.asarray(True)
    return functools.reduce(jnp.logical_and, leaves)


def create_train_state(params, state_vars, tx: optax.GradientTransformation,
                       cfg: EngineConfig) -> TrainState:
    # 'moe_losses' is a per-step sown intermediate (parallel/moe.py), not
    # model state: model.init materialises the collection (every collection
    # is mutable under init) but it must not persist in the train state
    state_vars = {k: v for k, v in state_vars.items() if k != "moe_losses"}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        state_vars=state_vars,
        opt_state=tx.init(params),
        # must be a COPY: jnp.asarray aliases, and the donating train step
        # would then donate the same buffer as both params and ema_params
        # ("Attempt to donate the same buffer twice")
        ema_params=jax.tree.map(jnp.copy, params) if cfg.use_ema else None,
    )


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    cfg: EngineConfig, mesh=None, donate: bool = True,
                    augment_fn=None):
    """Build the jitted SPMD train step.

    The returned fn has signature ``(state, batch, rng) -> (state, metrics)``.
    ``batch`` leaves have a leading global-batch dim; with ``accumulation_steps
    > 1`` the global batch is split into micro-batches scanned sequentially
    (grads averaged across micro-batches, one optimizer update).

    ``augment_fn(batch, rng) -> batch`` runs device-side data augmentation
    (data/device_augment.py) on the sharded global batch inside the jitted
    step, before the micro-batch split — the TPU-first replacement for the
    reference's host DataLoader-worker PIL augmentation.
    """
    accum = max(cfg.accumulation_steps, 1)

    def grads_and_metrics(params, state_vars, batch, rng):
        (loss, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state_vars, batch, rng, True)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return grads, metrics, new_vars

    def step_fn(state: TrainState, batch, rng):
        # fold the step counter in INSIDE jit: callers pass one constant
        # base rng for the whole run, so the hot loop issues zero eager
        # RNG dispatches (an eager per-step split/fold_in is its own
        # ~26-32ms relay call and serializes the async step queue —
        # perf/sam_engine_bisect.py measured 8x step inflation on SAM-B)
        rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None:
            batch = augment_fn(batch, jax.random.fold_in(rng, 0x5EED))
        if accum == 1:
            grads, metrics, new_vars = grads_and_metrics(
                state.params, state_vars=state.state_vars, batch=batch, rng=rng)
        else:
            # split leading dim into [accum, micro, ...]
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch)
            rngs = jax.random.split(rng, accum)

            def scan_body(carry, xs):
                acc_grads, state_vars = carry
                mb, r = xs
                g, m, nv = grads_and_metrics(state.params, state_vars, mb, r)
                acc_grads = jax.tree.map(jnp.add, acc_grads, g)
                return (acc_grads, nv), m

            zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                state.params)
            (gsum, new_vars), ms = jax.lax.scan(scan_body,
                                                (zero, state.state_vars),
                                                (micro, rngs))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            metrics = jax.tree.map(jnp.mean, ms)

        if cfg.clip_grad_value and cfg.clip_grad_value > 0:
            v = cfg.clip_grad_value
            grads = jax.tree.map(lambda g: jnp.clip(g, -v, v), grads)
        if cfg.clip_max_norm and cfg.clip_max_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.clip_max_norm /
                                jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        ok = jnp.asarray(True)
        if cfg.skip_non_finite:
            ok = jnp.logical_and(_tree_finite(grads),
                                 jnp.isfinite(metrics["loss"]))

        def apply(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return new_params, new_opt, new_vars

        def skip(_):
            return state.params, state.opt_state, state.state_vars

        new_params, new_opt, new_vars = jax.lax.cond(ok, apply, skip, None)

        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, new_params, cfg.ema_decay)

        metrics["skipped"] = (~ok).astype(jnp.float32)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               state_vars=new_vars, opt_state=new_opt,
                               ema_params=ema_params)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(eval_fn: LossFn):
    """eval_fn(params, state_vars, batch, rng, train=False) -> metrics dict.

    Metric reduction across devices is implicit (metrics are computed from the
    global sharded batch), replacing the reference's per-iteration
    all_reduce of scalar meters (tools/scripts.py:18-25,75-87).
    """

    @jax.jit
    def step_fn(params, state_vars, batch, rng):
        return eval_fn(params, state_vars, batch, rng, False)

    return step_fn
