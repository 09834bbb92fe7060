"""Flash-attention Pallas kernel vs plain softmax attention (runs in pallas
interpret mode on the CPU test mesh; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.flash_attention import (flash_attention,
                                                reference_attention)


def test_flash_matches_reference():
    rng = np.random.RandomState(0)
    b, h, n, d = 2, 2, 256, 32
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    ref = reference_attention(q, k, v)
    ours = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
