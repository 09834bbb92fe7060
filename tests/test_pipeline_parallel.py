"""Pipeline parallelism: GPipe fill+drain ring vs plain sequential execution.

The ground truth is the unpipelined program: chain the stage function over the
stacked parameters and take the identical loss. The pipelined loss, its
gradients (including through remat), and a short SGD trajectory must match on
a real ('data','pipe') virtual mesh — this is the same exactness bar the
engine's grad-accumulation scan is held to (tests/test_engine.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from simpleaicv_tpu.parallel.pipeline import (
    make_pipeline_loss_fn,
    make_pipeline_mesh,
    make_pipeline_train_step,
    stack_stage_params,
)

N_STAGES = 4
N_MICRO = 8
WIDTH = 16
BATCH = 32  # global; 2-way data parallel x 8 microbatches of 2


def stage_fn(p, x):
    """One residual MLP block: x + tanh(x @ w1 + b1) @ w2."""
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def loss_fn(y_pred, y_true):
    return jnp.mean((y_pred - y_true) ** 2)


def init_stages(key):
    ps = []
    for k in jax.random.split(key, N_STAGES):
        k1, k2 = jax.random.split(k)
        ps.append({
            "w1": jax.random.normal(k1, (WIDTH, WIDTH)) * 0.3,
            "b1": jnp.zeros((WIDTH,)),
            "w2": jax.random.normal(k2, (WIDTH, WIDTH)) * 0.3,
        })
    return ps


def sequential_loss(stacked, x, y):
    """Unpipelined ground truth with the identical microbatch mean."""
    def apply_all(xb):
        for s in range(N_STAGES):
            xb = stage_fn(jax.tree.map(lambda a: a[s], stacked), xb)
        return xb
    xm = x.reshape(N_MICRO, x.shape[0] // N_MICRO, WIDTH)
    ym = y.reshape(N_MICRO, y.shape[0] // N_MICRO, WIDTH)
    out = jax.vmap(apply_all)(xm)
    return jnp.mean(jax.vmap(loss_fn)(out, ym))


@pytest.fixture(scope="module")
def setup():
    mesh = make_pipeline_mesh(N_STAGES)
    assert mesh.shape == {"data": 2, "pipe": N_STAGES}
    key = jax.random.PRNGKey(0)
    stacked = stack_stage_params(init_stages(key), mesh)
    kx, ky = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (BATCH, WIDTH))
    y = jax.random.normal(ky, (BATCH, WIDTH))
    return mesh, stacked, x, y


def test_pipeline_loss_matches_sequential(setup):
    mesh, stacked, x, y = setup
    pipe = make_pipeline_loss_fn(stage_fn, loss_fn, mesh, n_micro=N_MICRO)
    got = jax.jit(pipe)(stacked, x, y)
    want = sequential_loss(jax.tree.map(np.asarray, stacked), x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_grads_match_sequential(setup, remat):
    mesh, stacked, x, y = setup
    pipe = make_pipeline_loss_fn(stage_fn, loss_fn, mesh, n_micro=N_MICRO,
                                 remat=remat)
    g_pipe = jax.jit(jax.grad(pipe))(stacked, x, y)
    g_seq = jax.grad(sequential_loss)(jax.tree.map(np.asarray, stacked), x, y)
    for gp, gs in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=2e-5, atol=1e-7)


def test_pipeline_grads_stay_stage_sharded(setup):
    """Each stage's gradient must keep the P('pipe') layout (no implicit
    all-gather of the weight stack)."""
    mesh, stacked, x, y = setup
    pipe = make_pipeline_loss_fn(stage_fn, loss_fn, mesh, n_micro=N_MICRO)
    g = jax.jit(jax.grad(pipe))(stacked, x, y)
    spec = g["w1"].sharding.spec
    assert spec[0] == "pipe", spec


def test_pipeline_train_step_learns(setup):
    mesh, stacked, x, y = setup
    opt = optax.sgd(0.05)
    step = make_pipeline_train_step(stage_fn, loss_fn, opt, mesh,
                                    n_micro=N_MICRO)
    params = stacked
    opt_state = opt.init(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses

    # and the trajectory equals plain full-model SGD
    seq_params = jax.tree.map(np.asarray, stacked)
    seq_opt_state = opt.init(seq_params)
    for _ in range(5):
        g = jax.grad(sequential_loss)(seq_params, x, y)
        upd, seq_opt_state = opt.update(g, seq_opt_state, seq_params)
        seq_params = optax.apply_updates(seq_params, upd)
    want = float(sequential_loss(seq_params, x, y))
    got = float(make_pipeline_loss_fn(stage_fn, loss_fn, mesh,
                                      n_micro=N_MICRO)(params, x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5)
