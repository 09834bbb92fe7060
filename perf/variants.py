"""Perf experiment harness: time ResNet-50 train-step variants on the chip.

Usage: python perf/variants.py [variant ...]
Variants: base bn_bf16 no_bn fwd_only scan
Each prints "<variant>: <img/s> (<ms/step>)".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
IMAGE = 224
STEPS = 50


def build(variant):
    import simpleaicv_tpu.models.common as common
    if variant == "bn_bf16":
        common.set_bn_compute_dtype(jnp.bfloat16)
    else:
        common.set_bn_compute_dtype(jnp.float32)
    common.set_bn_stats_barrier(variant == "bn_barrier")
    common.set_bn_fused(variant != "flax_bn")

    from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                            make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create("resnet50", num_classes=1000,
                             use_gradient_checkpoint=(variant == "remat"))
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init({"params": rng}, x0, True))()
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}

    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4),
        SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=100), 1000, params)
    eng_cfg = EngineConfig(skip_non_finite=False)
    state = create_train_state(params, state_vars, tx, eng_cfg)

    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(BATCH, IMAGE, IMAGE, 3), jnp.bfloat16),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, 1000, size=(BATCH,)), jnp.int32),
    }

    if variant == "fwd_only":
        @jax.jit
        def fwd(params, state_vars, image):
            out = model.apply({"params": params, **state_vars}, image, False)
            return jnp.sum(out.astype(jnp.float32))

        def run_once(s):
            return s, fwd(s.params, s.state_vars, batch["image"])

        def fetch(s, m):
            return float(m)
        return state, run_once, fetch, rng

    step = make_train_step(make_loss_fn(model, CELoss()), tx, eng_cfg)

    if variant == "scan":
        # whole measurement loop under one jit: zero per-step dispatch
        def loss_fn_state(state, rng):
            return step.__wrapped__(state, batch, rng)  # not used; see below

        @jax.jit
        def many(state, rng):
            def body(s, r):
                s, m = step._fun(s, batch, r) if hasattr(step, "_fun") else (None, None)
                return s, m["loss"]
            rngs = jax.random.split(rng, STEPS)
            return jax.lax.scan(body, state, rngs)

        def run_once(s):
            s2, losses = many(s, rng)
            return s2, losses

        def fetch(s, m):
            return float(m[-1])
        return state, run_once, fetch, rng

    def run_once(s, i=[0]):
        i[0] += 1
        return step(s, batch, jax.random.fold_in(rng, i[0]))

    def fetch(s, m):
        return float(m["loss"])
    return state, run_once, fetch, rng


def time_variant(variant):
    if variant == "scan":
        return time_scan()
    state, run_once, fetch, rng = build(variant)
    state, m = run_once(state)
    fetch(state, m)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = run_once(state)
    fetch(state, m)
    dt = time.perf_counter() - t0
    ips = BATCH * STEPS / dt
    print(f"{variant}: {ips:.1f} img/s ({1000*dt/STEPS:.2f} ms/step)", flush=True)


def time_scan():
    import simpleaicv_tpu.models.common as common
    common.set_bn_compute_dtype(jnp.float32)
    from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                            make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create("resnet50", num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init({"params": rng}, x0, True))()
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4),
        SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=100), 1000, params)
    eng_cfg = EngineConfig(skip_non_finite=False)
    state = create_train_state(params, state_vars, tx, eng_cfg)
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(BATCH, IMAGE, IMAGE, 3), jnp.bfloat16),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, 1000, size=(BATCH,)), jnp.int32),
    }

    from simpleaicv_tpu.core.engine import TrainState  # noqa
    loss_fn = make_loss_fn(model, CELoss())

    def one_step(s, r):
        (loss, (_, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s.params, s.state_vars, batch, r, True)
        updates, new_opt = tx.update(grads, s.opt_state, s.params)
        new_params = jax.tree.map(lambda p, u: p + u, s.params, updates)
        return s._replace(step=s.step + 1, params=new_params,
                          state_vars=new_vars, opt_state=new_opt), loss

    @jax.jit
    def many(s, rng):
        rngs = jax.random.split(rng, STEPS)
        return jax.lax.scan(one_step, s, rngs)

    s2, losses = many(state, rng)
    float(losses[-1])
    t0 = time.perf_counter()
    s2, losses = many(s2, jax.random.fold_in(rng, 1))
    float(losses[-1])
    dt = time.perf_counter() - t0
    ips = BATCH * STEPS / dt
    print(f"scan: {ips:.1f} img/s ({1000*dt/STEPS:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["base"]):
        time_variant(v)
