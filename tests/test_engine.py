"""End-to-end engine tests on the 8-device CPU mesh: SPMD training reduces the
loss, accumulation matches the big batch, NaN batches are skipped, EMA tracks."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                        make_train_step)
from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
from simpleaicv_tpu.core.schedule import SchedulerConfig
from simpleaicv_tpu.losses import CELoss
from simpleaicv_tpu.parallel import batch_sharding, shard_batch
from simpleaicv_tpu.tasks.classification import make_loss_fn


class TinyNet(nn.Module):
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x)


def _setup(mesh8, accum=1, use_ema=False, lr=0.1):
    model = TinyNet()
    x0 = jnp.zeros((8, 4, 4, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, True)
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}

    opt_cfg = OptimizerConfig(name="SGD", lr=lr, momentum=0.9,
                              weight_decay=1e-4)
    sched_cfg = SchedulerConfig(scheduler="CosineLR", lr=lr, epochs=10)
    tx, _ = build_optimizer(opt_cfg, sched_cfg, 10, params)
    eng_cfg = EngineConfig(accumulation_steps=accum, use_ema=use_ema)
    state = create_train_state(params, state_vars, tx, eng_cfg)
    loss_fn = make_loss_fn(model, CELoss())
    step = make_train_step(loss_fn, tx, eng_cfg, donate=False)
    return model, state, step


def _batch(mesh8, n=16, seed=0):
    rng = np.random.RandomState(seed)
    label = rng.randint(0, 4, size=(n,)).astype(np.int32)
    # make images linearly separable-ish by class
    image = (rng.randn(n, 4, 4, 3).astype(np.float32)
             + label[:, None, None, None].astype(np.float32))
    return shard_batch(mesh8, {"image": image, "label": label})


def test_loss_decreases_spmd(mesh8):
    _, state, step = _setup(mesh8)
    losses = []
    for i in range(30):
        batch = _batch(mesh8, seed=i % 4)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_accumulation_equivalence(mesh8):
    # same data: accum=2 over 16 == accum=1 over 16 (up to BN stats ordering)
    _, state1, step1 = _setup(mesh8, accum=1)
    _, state2, step2 = _setup(mesh8, accum=2)
    batch = _batch(mesh8, n=16, seed=0)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))
    state2, m2 = step2(state2, batch, jax.random.PRNGKey(0))
    # average loss must match closely; params follow the same grads modulo
    # BN-stat differences between the two micro-batches
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 0.05
    p1 = jax.flatten_util.ravel_pytree(state1.params)[0]
    p2 = jax.flatten_util.ravel_pytree(state2.params)[0]
    assert float(jnp.max(jnp.abs(p1 - p2))) < 0.05


def test_nan_skip(mesh8):
    _, state, step = _setup(mesh8)
    good = _batch(mesh8, seed=0)
    state, m = step(state, good, jax.random.PRNGKey(0))
    params_before = jax.flatten_util.ravel_pytree(state.params)[0]
    bad_image = np.full((16, 4, 4, 3), np.nan, np.float32)
    bad = shard_batch(mesh8, {"image": bad_image,
                              "label": np.zeros((16,), np.int32)})
    state, m = step(state, bad, jax.random.PRNGKey(1))
    assert float(m["skipped"]) == 1.0
    params_after = jax.flatten_util.ravel_pytree(state.params)[0]
    np.testing.assert_allclose(np.asarray(params_before),
                               np.asarray(params_after))
    # step counter still advances (reference counts the iteration too)
    assert int(state.step) == 2


def test_ema_tracks(mesh8):
    _, state, step = _setup(mesh8, use_ema=True)
    batch = _batch(mesh8, seed=0)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    ema = jax.flatten_util.ravel_pytree(state.ema_params)[0]
    cur = jax.flatten_util.ravel_pytree(state.params)[0]
    assert float(jnp.max(jnp.abs(ema - cur))) > 0  # lags behind
    assert jnp.all(jnp.isfinite(ema))


def test_engine_clip_grad(mesh8):
    """Engine-level clipping (reference tools/scripts.py:204-219): with SGD
    (no momentum yet at step 1) and clip_max_norm, the param delta norm is
    bounded by lr * clip_max_norm."""
    model = TinyNet()
    x0 = jnp.zeros((8, 4, 4, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, True)
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}

    opt_cfg = OptimizerConfig(name="SGD", lr=1.0, momentum=0.0,
                              weight_decay=0.0)
    sched_cfg = SchedulerConfig(scheduler="MultiStepLR", lr=1.0, epochs=10,
                                milestones=[100])
    tx, _ = build_optimizer(opt_cfg, sched_cfg, 10, params)
    eng_cfg = EngineConfig(clip_max_norm=1e-3)
    state = create_train_state(params, state_vars, tx, eng_cfg)
    step = make_train_step(make_loss_fn(model, CELoss()), tx, eng_cfg,
                           donate=False)
    before = jax.flatten_util.ravel_pytree(state.params)[0]
    state, m = step(state, _batch(mesh8, seed=3), jax.random.PRNGKey(0))
    after = jax.flatten_util.ravel_pytree(state.params)[0]
    delta = float(jnp.linalg.norm(after - before))
    assert 0 < delta <= 1e-3 + 1e-6

    # clip_grad_value: every grad element clamped -> delta_inf <= lr * v
    eng_cfg = EngineConfig(clip_grad_value=1e-4)
    state2 = create_train_state(params, state_vars, tx, eng_cfg)
    step2 = make_train_step(make_loss_fn(model, CELoss()), tx, eng_cfg,
                            donate=False)
    state2, _ = step2(state2, _batch(mesh8, seed=3), jax.random.PRNGKey(0))
    after2 = jax.flatten_util.ravel_pytree(state2.params)[0]
    assert float(jnp.max(jnp.abs(after2 - before))) <= 1e-4 * 1.001
