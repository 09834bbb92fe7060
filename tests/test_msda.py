"""MS-deformable-attention equivalence test: our XLA core vs the reference's
pytorch fallback formulation (torch grid_sample) — the same reference-vs-
optimized check as the reference's
compile_multiscale_deformable_attention/test.py."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.msda import ms_deform_attn_xla

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def ref_msda(value, shapes, locs, weights):
    """Literal restatement of ms_deform_attn_core_pytorch
    (multiscale_deformable_attention.py:43-74)."""
    value = torch.tensor(value)
    locs = torch.tensor(locs)
    weights = torch.tensor(weights)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = locs.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * locs - 1
    out_list = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        out_list.append(F.grid_sample(v, g, mode="bilinear",
                                      padding_mode="zeros",
                                      align_corners=False))
    w_ = weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(out_list, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).numpy()


def test_msda_xla_matches_reference():
    rng = np.random.RandomState(0)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    b, m, d, lq, p = 2, 4, 8, 10, 3
    value = rng.randn(b, s, m, d).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, (b, lq, m, len(shapes), p, 2)).astype(
        np.float32)
    weights = rng.rand(b, lq, m, len(shapes), p).astype(np.float32)
    weights /= weights.sum(axis=(3, 4), keepdims=True)

    ours = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)))
    ref = ref_msda(value, shapes, locs, weights)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_msda_out_of_bounds_zero_padding():
    shapes = ((4, 4),)
    value = np.ones((1, 16, 1, 2), np.float32)
    locs = np.full((1, 1, 1, 1, 1, 2), 2.0, np.float32)  # far outside
    weights = np.ones((1, 1, 1, 1, 1), np.float32)
    out = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes,
                                        jnp.asarray(locs),
                                        jnp.asarray(weights)))
    np.testing.assert_allclose(out, 0.0)
