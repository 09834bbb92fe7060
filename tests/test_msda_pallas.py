"""Pallas MSDA kernel (interpret mode on the CPU mesh) vs the XLA core."""

import numpy as np
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.msda import ms_deform_attn_xla
from simpleaicv_tpu.ops.msda_pallas import ms_deform_attn_pallas


def test_pallas_matches_xla():
    rng = np.random.RandomState(0)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    b, m, d, lq, p = 2, 2, 16, 20, 3
    value = rng.randn(b, s, m, d).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (b, lq, m, len(shapes), p, 2)).astype(
        np.float32)
    weights = rng.rand(b, lq, m, len(shapes), p).astype(np.float32)

    xla = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes,
                                        jnp.asarray(locs),
                                        jnp.asarray(weights)))
    pallas = np.asarray(ms_deform_attn_pallas(jnp.asarray(value), shapes,
                                              jnp.asarray(locs),
                                              jnp.asarray(weights),
                                              block_q=16))
    np.testing.assert_allclose(pallas, xla, atol=1e-4, rtol=1e-4)
