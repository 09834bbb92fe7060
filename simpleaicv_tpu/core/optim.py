"""Optimizer builder: optax with the reference's parameter-group semantics.

Capability parity with reference ``build_optimizer`` (tools/utils.py:275-582):

* SGD (momentum/nesterov, wd folded into grads before momentum — torch style)
  and AdamW (decoupled wd) — reference tools/utils.py:567-582;
* ``global_weight_decay=False`` → wd=0 for 1-D params and for params whose
  name matches ``no_weight_decay_layer_name_list`` (tools/utils.py:344-352);
* per-sublayer lr / wd overrides by name-substring (``sub_layer_lr`` /
  ``sub_layer_weight_decay``, tools/utils.py:352-366,516-525);
* ViT layer-wise lr decay: embedding-like params get the deepest decay,
  transformer block *i* gets ``decay**(num_blocks - i)`` (tools/utils.py:295-338);
* the LR schedule shape is applied to each group's own init lr
  (tools/utils.py:222-247) — here computed per-leaf inside the update, so the
  whole optimizer is one pure jittable `optax.GradientTransformation`.

TPU-first notes: instead of materialising torch param-groups, we precompute two
static per-leaf trees (lr_scale, weight_decay) from the flattened param paths;
the update is fully fused by XLA into the train step.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Mapping, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .schedule import SchedulerConfig, lr_at_epoch


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "SGD"  # SGD | AdamW
    lr: float = 0.1
    weight_decay: float = 1e-4
    global_weight_decay: bool = False
    no_weight_decay_layer_name_list: Tuple[str, ...] = ()
    sub_layer_lr: Optional[Mapping[str, float]] = None
    sub_layer_weight_decay: Optional[Mapping[str, float]] = None
    # SGD
    momentum: float = 0.9
    nesterov: bool = False
    # AdamW
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    # ViT layer-wise lr decay (reference tools/utils.py:294-338)
    lr_layer_decay: Optional[float] = None
    lr_layer_decay_block_nums: Optional[int] = None
    block_name: Optional[str] = None  # substring identifying block params, e.g. 'blocks'
    # grad clipping (reference tools/scripts.py:202-237 applies after unscale)
    clip_grad_value: Optional[float] = None
    clip_max_norm: Optional[float] = None
    # hard-freeze by name substring: update forced to exactly zero (the
    # reference freezes via requires_grad=False; per-leaf lr=0 is not enough
    # under schedules with a nonzero min_lr floor)
    frozen_layer_name_list: Tuple[str, ...] = ()


_EMBED_SCALE0_NAMES = ("position_encoding", "cls_token", "patch_embedding")
_BLOCK_IDX_RE = re.compile(r"_(\d+)(?:/|$)")


def _leaf_paths(params) -> list[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(_key_str(k) for k in path) for path, _ in flat]


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def per_leaf_hyperparams(cfg: OptimizerConfig, params):
    """Returns (lr_scale_tree, wd_tree, table) of python floats per leaf.

    ``lr_scale`` is relative to ``cfg.lr``; ``table`` is a list of
    (name, lr, lr_scale, wd) rows for startup logging (parity with the
    reference's per-parameter lr/wd table dump,
    tools/train_classification_model.py:121-134).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = _leaf_paths(params)

    layer_scales = None
    if cfg.lr_layer_decay is not None:
        assert cfg.lr_layer_decay_block_nums is not None and cfg.block_name
        num_layers = cfg.lr_layer_decay_block_nums + 1
        layer_scales = [
            cfg.lr_layer_decay**(num_layers - i) for i in range(num_layers + 1)
        ]

    lr_scales, wds, table = [], [], []
    for name, leaf in zip(paths, leaves):
        # weight decay
        if cfg.global_weight_decay:
            wd = cfg.weight_decay
        elif leaf.ndim <= 1 or any(s in name
                                   for s in cfg.no_weight_decay_layer_name_list):
            wd = 0.0
        else:
            wd = cfg.weight_decay
            if cfg.sub_layer_weight_decay:
                for prefix, sub_wd in cfg.sub_layer_weight_decay.items():
                    if prefix in name:
                        wd = float(sub_wd)
                        break
        # per-sublayer lr override
        leaf_lr = cfg.lr
        if cfg.sub_layer_lr:
            for prefix, sub_lr in cfg.sub_layer_lr.items():
                if prefix in name:
                    leaf_lr = float(sub_lr)
                    break
        # ViT layer-wise decay
        scale = 1.0
        if layer_scales is not None:
            if cfg.block_name in name:
                m = _BLOCK_IDX_RE.search(name)
                layer_id = int(m.group(1)) if m else 0
                layer_id = min(layer_id, cfg.lr_layer_decay_block_nums - 1)
                scale = layer_scales[layer_id + 1]
            elif any(s in name for s in _EMBED_SCALE0_NAMES):
                scale = layer_scales[0]

        frozen = any(s in name for s in cfg.frozen_layer_name_list)
        if frozen:
            wd = 0.0
        lr_scales.append(0.0 if frozen else leaf_lr / cfg.lr * scale)
        wds.append(wd)
        table.append((name, 0.0 if frozen else leaf_lr, scale, wd))

    return (jax.tree_util.tree_unflatten(treedef, lr_scales),
            jax.tree_util.tree_unflatten(treedef, wds), table)


class ScaleByScheduleState(NamedTuple):
    step: jnp.ndarray


def _per_leaf_lr(cfg: OptimizerConfig, sched: SchedulerConfig, steps_per_epoch,
                 step, lr_scale_leaf):
    """Schedule shape applied to this leaf's init lr (reference utils.py:222-247)."""
    frac_epoch = step.astype(jnp.float32) / float(max(steps_per_epoch, 1))
    leaf_sched = dataclasses.replace(sched, lr=sched.lr * float(lr_scale_leaf))
    return lr_at_epoch(leaf_sched, frac_epoch)


def build_optimizer(cfg: OptimizerConfig,
                    sched: SchedulerConfig,
                    steps_per_epoch: int,
                    params) -> tuple[optax.GradientTransformation, list]:
    """Build the full update transformation. Returns (tx, group_table)."""
    lr_scale_tree, wd_tree, table = per_leaf_hyperparams(cfg, params)

    chain = []
    if cfg.clip_grad_value is not None:
        v = float(cfg.clip_grad_value)
        chain.append(
            optax.stateless(lambda g, p: jax.tree.map(
                lambda x: jnp.clip(x, -v, v), g)))
    if cfg.clip_max_norm is not None:
        chain.append(optax.clip_by_global_norm(float(cfg.clip_max_norm)))

    if cfg.name == "SGD":
        # torch couples wd into the gradient before the momentum buffer
        chain.append(
            optax.stateless(lambda g, p: jax.tree.map(
                lambda gi, pi, wdi: gi + wdi * pi, g, p, wd_tree)))
        if cfg.momentum:
            chain.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
    elif cfg.name == "AdamW":
        chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps))
        # decoupled wd added to the update, scaled by the same per-leaf lr
        chain.append(
            optax.stateless(lambda g, p: jax.tree.map(
                lambda gi, pi, wdi: gi + wdi * pi, g, p, wd_tree)))
    else:
        raise ValueError(f"Unsupported optimizer {cfg.name!r}")

    def init_sched(params):
        del params
        return ScaleByScheduleState(step=jnp.zeros((), jnp.int32))

    def update_sched(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g, s: jnp.where(
                s == 0.0, jnp.zeros_like(g),
                -_per_leaf_lr(cfg, sched, steps_per_epoch, state.step, s) * g),
            updates, lr_scale_tree)
        return updates, ScaleByScheduleState(step=state.step + 1)

    chain.append(optax.GradientTransformation(init_sched, update_sched))
    return optax.chain(*chain), table


def current_lr(cfg: OptimizerConfig, sched: SchedulerConfig,
               steps_per_epoch: int, step: int) -> float:
    """Base-group LR at a given step, for logging."""
    frac_epoch = float(step) / float(max(steps_per_epoch, 1))
    return float(lr_at_epoch(sched, frac_epoch))
