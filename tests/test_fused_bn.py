"""FusedBatchNorm (ops/fused_bn.py) equivalence vs flax.linen.BatchNorm:
forward, backward, running-stat update, and checkpoint variable layout."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleaicv_tpu.ops.fused_bn import FusedBatchNorm, bn_train


@pytest.mark.parametrize("shape", [(4, 8, 8, 16), (4, 8, 8, 3)])
def test_fused_bn_matches_flax_forward_and_stats(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 2 + 1, jnp.float32)

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    fused = FusedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_f = fused.init(jax.random.PRNGKey(0), x)
    # same variable layout (checkpoint compatibility)
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_f)

    y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    y_f, m_f = fused.apply(v_f, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m_ref["batch_stats"]["mean"]),
        np.asarray(m_f["batch_stats"]["mean"]), atol=2e-5, rtol=2e-5)
    # running VAR: fused blends the UNBIASED batch variance (torch ATen
    # batch_norm semantics, pinned cross-framework by
    # tests/test_reference_train_parity.py); flax blends the biased one.
    # expected = m*init + (1-m)*batch_var*n/(n-1), reconstructed from the
    # flax update (init var is ones).
    n = x.size // x.shape[-1]
    expected_var = 0.9 + (np.asarray(m_ref["batch_stats"]["var"]) - 0.9) \
        * (n / (n - 1))
    np.testing.assert_allclose(np.asarray(m_f["batch_stats"]["var"]),
                               expected_var, atol=2e-5, rtol=2e-5)


def test_fused_bn_matches_flax_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 6, 6, 8) * 1.5, jnp.float32)
    gamma = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(8), jnp.float32)
    w = jnp.asarray(rng.randn(4, 6, 6, 8), jnp.float32)

    def loss_ref(x, gamma, beta):
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return jnp.sum(y * w)

    def loss_fused(x, gamma, beta):
        y, _, _ = bn_train(x, gamma, beta, jnp.zeros_like(gamma), 1e-5)
        return jnp.sum(y * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_ref, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_fused_bn_bf16_and_eval_mode():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.bfloat16)
    mod = FusedBatchNorm(use_running_average=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    y, mut = mod.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    # eval mode uses the updated running stats
    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    mod_eval = FusedBatchNorm(use_running_average=True)
    y_eval = mod_eval.apply(v2, x)
    assert y_eval.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y_eval, np.float32)).all()


def test_fused_bn_nlc_rank3():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 10, 8), jnp.float32)
    mod = FusedBatchNorm(use_running_average=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    y, _ = mod.apply(v, x, mutable=["batch_stats"])
    assert y.shape == x.shape
    np.testing.assert_allclose(float(jnp.mean(y)), 0.0, atol=1e-5)
