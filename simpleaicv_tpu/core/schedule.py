"""Learning-rate schedules as pure functions of fractional epoch.

Capability parity with the reference's ``Scheduler`` (reference:
tools/utils.py:188-272): linear warmup followed by MultiStepLR / CosineLR /
PolyLR, all evaluated at a *fractional* epoch (``iter/iters_per_epoch + epoch``)
so the LR moves every step, and stateless so it jits cleanly — the schedule is
baked into the compiled train step as a function of the step counter.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    scheduler: str = "CosineLR"  # MultiStepLR | CosineLR | PolyLR
    lr: float = 0.1
    epochs: int = 100
    warm_up_epochs: int = 0
    # MultiStepLR
    milestones: Sequence[int] = ()
    gamma: float = 0.1
    # PolyLR
    power: float = 0.9
    # final floor (cosine decays to min_lr)
    min_lr: float = 0.0


def lr_at_epoch(cfg: SchedulerConfig, frac_epoch):
    """LR at fractional epoch (traced-value friendly; usable inside jit)."""
    e = jnp.asarray(frac_epoch, jnp.float32)
    lr = jnp.asarray(cfg.lr, jnp.float32)
    warm = jnp.asarray(max(cfg.warm_up_epochs, 0), jnp.float32)

    warm_lr = lr * e / jnp.maximum(warm, 1e-8)

    decay_span = jnp.maximum(cfg.epochs - warm, 1e-8)
    t = jnp.clip((e - warm) / decay_span, 0.0, 1.0)

    if cfg.scheduler == "MultiStepLR":
        n_passed = jnp.zeros((), jnp.float32)
        for m in cfg.milestones:
            n_passed = n_passed + (e >= m).astype(jnp.float32)
        main_lr = lr * jnp.power(cfg.gamma, n_passed)
    elif cfg.scheduler == "CosineLR":
        main_lr = (cfg.min_lr + 0.5 * (lr - cfg.min_lr) *
                   (1.0 + jnp.cos(jnp.pi * t)))
    elif cfg.scheduler == "PolyLR":
        main_lr = (lr - cfg.min_lr) * jnp.power(1.0 - t, cfg.power) + cfg.min_lr
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")

    use_warm = jnp.logical_and(warm > 0, e < warm)
    return jnp.where(use_warm, warm_lr, main_lr)


def lr_fn_per_step(cfg: SchedulerConfig, steps_per_epoch: int):
    """Returns an optax-style ``schedule(step) -> lr`` using fractional epochs."""

    def schedule(step):
        frac_epoch = jnp.asarray(step, jnp.float32) / float(max(steps_per_epoch, 1))
        return lr_at_epoch(cfg, frac_epoch)

    return schedule
