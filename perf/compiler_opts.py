"""Try TPU backend compiler_options on the ResNet-50 train step (the env
XLA_FLAGS path aborts in the local client; per-jit compiler_options ship to
the server-side compiler)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

OPTS = {
    "default": {},
    "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
}


def main():
    from perf.variants import build
    state, run_once, fetch, rng = build("base")
    # rebuild the jitted step with compiler options via lower/compile
    from perf import variants
    import jax.numpy as jnp
    from simpleaicv_tpu.core.engine import EngineConfig, make_train_step
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create("resnet50", num_classes=1000)
    rngk = jax.random.PRNGKey(0)
    B = 128
    x0 = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init({"params": rngk}, x0, True))()
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    tx, _ = build_optimizer(
        OptimizerConfig(name="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4),
        SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=100), 1000,
        params)
    from simpleaicv_tpu.core.engine import create_train_state
    eng = EngineConfig(skip_non_finite=False)
    state = create_train_state(params, state_vars, tx, eng)
    step = make_train_step(make_loss_fn(model, CELoss()), tx, eng,
                           donate=False)

    batch = {
        "image": jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3),
                             jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, size=(B,)), jnp.int32),
    }

    lowered = jax.jit(step.__wrapped__).lower(state, batch, rngk)
    for name, opts in OPTS.items():
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(f"{name}: compile failed: {str(e)[:200]}", flush=True)
            continue
        s, m = compiled(state, batch, rngk)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(50):
            s, m = compiled(s, batch, rngk)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: {B/dt:.1f} img/s ({dt*1000:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
