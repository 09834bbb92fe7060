"""MoE expert parallelism: routing math vs a dense per-token ground truth.

The ground truth for the gather-free dispatch is the obvious per-token loop:
route each token to its top-k experts by router prob, apply each expert's FFN
densely, combine with (renormalised) gates. With capacity high enough that
nothing drops, the einsum formulation must match it exactly; with capacity
forced to 1, exactly one token per expert may survive and the rest must
contribute zero. Expert-sharded execution on the virtual mesh must equal the
single-device result bit-for-bit semantics (allclose).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleaicv_tpu.models.common import set_compute_dtype
from simpleaicv_tpu.parallel.moe import (MoEFeedForward, expert_param_sharding,
                                         moe_aux_loss, top_k_dispatch)


@pytest.fixture(autouse=True)
def f32_compute():
    set_compute_dtype(jnp.float32)
    yield
    set_compute_dtype(jnp.bfloat16)


T, C, H, E = 24, 8, 16, 4


def dense_reference(params, x, top_k):
    """Per-token loop: each token through its top-k experts, gates
    renormalised for k>1 (no capacity limit)."""
    p = params["params"]
    probs = jax.nn.softmax(x @ p["router"], axis=-1)
    out = np.zeros_like(np.asarray(x))
    for t in range(x.shape[0]):
        pr = np.asarray(probs[t]).copy()
        picks, gates = [], []
        for _ in range(top_k):
            e = int(pr.argmax())
            picks.append(e)
            gates.append(float(np.asarray(probs[t, e])))
            pr[e] = -1.0
        if top_k > 1:
            s = sum(gates)
            gates = [g / s for g in gates]
        for e, g in zip(picks, gates):
            h = np.asarray(x[t]) @ np.asarray(p["wi"][e]) + np.asarray(
                p["bi"][e, 0])
            h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
            y = h @ np.asarray(p["wo"][e]) + np.asarray(p["bo"][e, 0])
            out[t] += g * y
    return out


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_dense_per_token_loop(top_k):
    # capacity_factor large enough that no token ever drops
    layer = MoEFeedForward(hidden=H, num_experts=E, top_k=top_k,
                           capacity_factor=float(E))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, C))
    params = layer.init(jax.random.PRNGKey(0), x)
    got = layer.apply(params, x)
    want = dense_reference(params, x[0], top_k)
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-5, atol=2e-6)


def test_aux_loss_uniform_router_is_one():
    probs = jnp.full((T, E), 1.0 / E)
    _, _, aux = top_k_dispatch(probs, capacity=T, top_k=1)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_capacity_drops_are_zero_not_garbage():
    # all tokens prefer expert 0 -> with capacity 1 only the first token
    # gets dispatched; everyone else's output must be exactly zero
    probs = jnp.tile(jnp.asarray([[0.97, 0.01, 0.01, 0.01]]), (T, 1))
    dispatch, combine, _ = top_k_dispatch(probs, capacity=1, top_k=1)
    d = np.asarray(dispatch)
    assert d[0, 0, 0] == 1.0
    assert d[1:].sum() == 0.0
    assert np.asarray(combine)[1:].sum() == 0.0


def test_dispatch_positions_are_disjoint_slots():
    probs = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(3), (T, E)), axis=-1)
    dispatch, _, _ = top_k_dispatch(probs, capacity=T, top_k=2)
    # every (expert, slot) buffer cell holds at most one token
    per_slot = np.asarray(dispatch).sum(axis=0)  # [E, Cap]
    assert per_slot.max() <= 1.0 + 1e-6
    # every token occupies exactly top_k slots (capacity ample)
    per_token = np.asarray(dispatch).sum(axis=(1, 2))
    np.testing.assert_allclose(per_token, 2.0, rtol=1e-6)


def test_expert_sharded_equals_replicated(mesh8):
    layer = MoEFeedForward(hidden=H, num_experts=E, top_k=2,
                           capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, C))
    params = {"params": layer.init(jax.random.PRNGKey(0), x)["params"]}
    want = layer.apply(params, x)

    shardings = {"params": expert_param_sharding(mesh8, params["params"],
                                                 axis="fsdp")}
    sharded = jax.device_put(params, shardings)
    assert sharded["params"]["wi"].sharding.spec[0] == "fsdp"
    got = jax.jit(lambda p, x: layer.apply(p, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_router_z_loss_value():
    """z-loss == mean(logsumexp(logits)^2); with zero router weights the
    logits are 0 so logsumexp = log(E) exactly."""
    layer = MoEFeedForward(hidden=H, num_experts=E, top_k=1,
                           router_z_weight=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, C))
    params = layer.init(jax.random.PRNGKey(0), x)
    zeroed = jax.tree.map(jnp.zeros_like, params["params"])
    _, muts = layer.apply({"params": zeroed}, x, mutable=["moe_losses"])
    # balanced aux term is exactly 1.0 (uniform probs); z adds log(E)^2
    want = 1.0 + float(np.log(E)) ** 2
    np.testing.assert_allclose(float(moe_aux_loss(muts)), want, rtol=1e-6)


def test_vit_moe_forward_grads_and_aux():
    from simpleaicv_tpu.core.registry import BACKBONES

    model = BACKBONES.create("vit_moe_tiny_patch16", image_size=32,
                             num_classes=10, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)

    def loss(params):
        logits, muts = model.apply({"params": params}, x, True,
                                   mutable=["moe_losses"],
                                   rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(logits**2) + 0.01 * moe_aux_loss(muts)

    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # MoE blocks sit at odd indices; router grads must be non-zero (the
    # aux loss reaches the router even where combine gates saturate)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
        g["blocks_1"]["moe_mlp"])))
    assert gn > 0.0
