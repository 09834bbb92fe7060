"""Ring attention == full softmax attention, values and gradients.

Ground truth is the plain einsum attention over the full (unsharded)
sequence; the ring version computes the identical function with KV rotating
over a real 'sp' mesh axis, so outputs and all three input gradients must
match to f32 tolerance on the virtual 8-device mesh, for both a pure-sp mesh
and a composed ('data','sp') layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simpleaicv_tpu.parallel.ring_attention import make_ring_attention

B, H, N, D = 2, 3, 32, 8


def full_attention(q, k, v):
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (D**-0.5)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _qkv(key):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("mesh_shape", [{"sp": 8}, {"data": 2, "sp": 4}])
def test_ring_matches_full(mesh_shape):
    devs = np.asarray(jax.devices()[:8]).reshape(*mesh_shape.values())
    mesh = Mesh(devs, tuple(mesh_shape))
    data_axis = "data" if "data" in mesh_shape else None
    ring = make_ring_attention(mesh, axis="sp", data_axis=data_axis)

    q, k, v = _qkv(jax.random.PRNGKey(0))
    sh = NamedSharding(mesh, P(data_axis, None, "sp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    got = jax.jit(ring)(qs, ks, vs)
    want = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-6)
    # output keeps the sequence-sharded layout
    assert got.sharding.spec[2] == "sp"


def test_ring_gradients_match_full():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    ring = make_ring_attention(mesh, axis="sp", data_axis=None)
    q, k, v = _qkv(jax.random.PRNGKey(1))
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    def loss_ring(q, k, v):
        out = ring(q, k, v)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_full(q, k, v):
        out = full_attention(q, k, v)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), rtol=5e-5,
                                   atol=5e-6)


def test_ring_bf16_inputs():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    ring = make_ring_attention(mesh, axis="sp", data_axis=None)
    q, k, v = _qkv(jax.random.PRNGKey(2))
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    got = jax.jit(ring)(*(jax.device_put(x, sh) for x in (qb, kb, vb)))
    assert got.dtype == jnp.bfloat16
    want = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)
