"""C++ native ops vs the JAX kernels: three independent implementations
(numpy restatement / XLA / C++) must agree."""

import numpy as np
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops import native
from simpleaicv_tpu.ops.nms import nms_keep_mask
from simpleaicv_tpu.ops.msda import ms_deform_attn_xla

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_nms_matches_xla():
    rng = np.random.RandomState(0)
    n = 64
    ctr = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()

    cpp_keep = native.native_greedy_nms(boxes, 0.5)
    xla_keep = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                        jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(cpp_keep, xla_keep)


def test_native_msda_matches_xla():
    rng = np.random.RandomState(1)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    heads, dim, lq, p = 4, 8, 10, 3
    value = rng.randn(s, heads, dim).astype(np.float32)
    locs = rng.uniform(0.0, 1.0, (lq, heads, len(shapes), p, 2)).astype(
        np.float32)
    weights = rng.rand(lq, heads, len(shapes), p).astype(np.float32)

    cpp = native.native_ms_deform_attn(value, shapes, locs, weights)
    xla = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value)[None], shapes, jnp.asarray(locs)[None],
        jnp.asarray(weights)[None]))[0]
    np.testing.assert_allclose(cpp, xla, atol=1e-4, rtol=1e-4)
