"""Pipelined registry ViT == plain model.apply.

The ground truth is the ordinary flax forward of the same variables; the
pipelined version (embed/head restated outside the ring, blocks inside)
must reproduce it to f32 tolerance for both the cls-token and global-pool
heads, and gradients must flow to every stage shard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleaicv_tpu.core.registry import BACKBONES
from simpleaicv_tpu.models.common import set_compute_dtype
from simpleaicv_tpu.parallel.pipeline import make_pipeline_mesh
from simpleaicv_tpu.parallel.pipeline_vit import (make_vit_pipeline_apply,
                                                  vit_stage_params)

N_STAGES = 4
N_MICRO = 4
BATCH = 8


@pytest.fixture(autouse=True)
def f32_compute():
    set_compute_dtype(jnp.float32)
    yield
    set_compute_dtype(jnp.bfloat16)


def _setup(global_pool):
    model = BACKBONES.create("vit_small_patch14", image_size=28,
                             num_classes=10, global_pool=global_pool)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 28, 28, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    return model, variables, x


@pytest.mark.parametrize("global_pool", [False, True])
def test_pipelined_vit_matches_plain_apply(global_pool):
    model, variables, x = _setup(global_pool)
    want = model.apply(variables, x, False)

    mesh = make_pipeline_mesh(N_STAGES)
    stage_params = vit_stage_params(variables["params"], N_STAGES, mesh)
    apply_fn = make_vit_pipeline_apply(model, mesh, n_micro=N_MICRO)
    got = jax.jit(apply_fn)(variables["params"], stage_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_pipelined_vit_composes_with_data_parallel():
    """dp x pp on one ('data','pipe') mesh: microbatches sharded over 'data',
    stages over 'pipe'; output must still equal plain apply."""
    model, variables, x = _setup(False)
    mesh = make_pipeline_mesh(N_STAGES)  # ('data': 2, 'pipe': 4)
    stage_params = vit_stage_params(variables["params"], N_STAGES, mesh)
    apply_fn = make_vit_pipeline_apply(model, mesh, n_micro=N_MICRO,
                                       data_axis="data")
    got = jax.jit(apply_fn)(variables["params"], stage_params, x)
    want = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_pipelined_vit_grads_reach_every_stage():
    model, variables, x = _setup(False)
    mesh = make_pipeline_mesh(N_STAGES)
    stage_params = vit_stage_params(variables["params"], N_STAGES, mesh)
    apply_fn = make_vit_pipeline_apply(model, mesh, n_micro=N_MICRO)

    def loss(params, stage_params):
        return jnp.mean(apply_fn(params, stage_params, x) ** 2)

    gp, gs = jax.jit(jax.grad(loss, argnums=(0, 1)))(variables["params"],
                                                     stage_params)
    # every stage's qkv kernel must receive non-zero gradient
    gq = np.asarray(gs["attn"]["qkv"]["kernel"])  # [S, L/S, C, 3C]
    per_stage = np.abs(gq).sum(axis=tuple(range(1, gq.ndim)))
    assert (per_stage > 0).all(), per_stage
    # stage grads stay 'pipe'-sharded; embed/head grads flow too
    assert gs["attn"]["qkv"]["kernel"].sharding.spec[0] == "pipe"
    assert float(np.abs(np.asarray(gp["fc"]["kernel"])).sum()) > 0
    assert float(np.abs(np.asarray(
        gp["patch_embedding"]["kernel"])).sum()) > 0
