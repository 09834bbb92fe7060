"""Multi-step fused dispatch: scan K train steps inside one jit over a
stacked batch (the MLPerf-style host-free loop). Measures img/s vs the
one-dispatch-per-step baseline."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, IMG, K, OUTER = 128, 224, 10, 6


def main():
    from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                            make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create("resnet50", num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init({"params": rng}, x0, True))()
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4),
        SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=100), 1000,
        params)
    eng = EngineConfig(skip_non_finite=False)
    state = create_train_state(params, state_vars, tx, eng)
    step = make_train_step(make_loss_fn(model, CELoss()), tx, eng,
                           donate=False)
    raw_step = step.__wrapped__

    batches = {
        "image": jnp.asarray(np.random.RandomState(0).randn(
            K, B, IMG, IMG, 3), jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, size=(K, B)), jnp.int32),
    }

    @jax.jit
    def multi(state, batches, rng):
        def body(carry, batch):
            s, r = carry
            r, r2 = jax.random.split(r)
            s, m = raw_step(s, batch, r2)
            return (s, r), m["loss"]
        (state, _), losses = jax.lax.scan(body, (state, rng), batches)
        return state, losses

    s, losses = multi(state, batches, rng)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(OUTER):
        s, losses = multi(s, batches, rng)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f"scan K={K}: {B/dt:.1f} img/s ({dt*1000:.2f} ms/step)", flush=True)

    one = {"image": batches["image"][0], "label": batches["label"][0]}
    s, m = step(state, one, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(OUTER * K):
        s, m = step(s, one, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f"per-step dispatch: {B/dt:.1f} img/s ({dt*1000:.2f} ms/step)",
          flush=True)


if __name__ == "__main__":
    main()
