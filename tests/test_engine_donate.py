"""Donated-buffer train steps across engine feature combinations.

The Trainer builds its step with ``donate=True`` (XLA reuses the old state
buffers — halves state memory), while most engine tests use donate=False;
buffer-aliasing bugs hide in that gap (e.g. EMA params initialised as
ALIASES of params -> "Attempt to donate the same buffer twice" on the very
first real step — caught by tests/test_convergence.py, pinned here at toy
scale for every feature combination).
"""

import itertools

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                        make_train_step)
from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
from simpleaicv_tpu.core.schedule import SchedulerConfig
from simpleaicv_tpu.losses import CELoss
from simpleaicv_tpu.parallel import shard_batch
from simpleaicv_tpu.tasks.classification import make_loss_fn


class Tiny(nn.Module):

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(16)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(4)(nn.relu(x))


@pytest.mark.parametrize("accum,use_ema,clip",
                         list(itertools.product([1, 2], [False, True],
                                                [0.0, 1.0])))
def test_donated_step_combinations(mesh8, accum, use_ema, clip):
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 4, 4, 3)),
                           True)
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.1, momentum=0.9),
        SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=2), 4, params)
    cfg = EngineConfig(accumulation_steps=accum, use_ema=use_ema,
                       ema_decay=0.9, clip_max_norm=clip)
    state = create_train_state(params, state_vars, tx, cfg)
    step = make_train_step(make_loss_fn(model, CELoss()), tx, cfg,
                           donate=True)

    rng = np.random.RandomState(0)
    for i in range(3):
        batch = shard_batch(mesh8, {
            "image": rng.randn(16, 4, 4, 3).astype(np.float32),
            "label": rng.randint(0, 4, size=(16,)).astype(np.int32)})
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), metrics
    assert int(state.step) == 3
    if use_ema:
        # EMA actually tracked (≠ params after updates, finite)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.ema_params, state.params)
        assert max(jax.tree.leaves(d)) > 0.0
