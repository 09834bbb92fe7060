"""ops/upsample.py: the matmul-resize must be numerically interchangeable
with the paths it replaces (jax.image.resize bilinear; the gather-based
align-corners _upsample_to; nearest repeat), in forward AND gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleaicv_tpu.ops.upsample import resize_bilinear, upsample_nearest_2x


SIZE_PAIRS = [(8, 32), (16, 64), (7, 19), (32, 8), (20, 11), (13, 13)]


@pytest.mark.parametrize("s_in,s_out", SIZE_PAIRS)
def test_half_pixel_matches_jax_image_resize(s_in, s_out):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, s_in, s_in, 3), jnp.float32)
    want = jax.image.resize(x, (2, s_out, s_out, 3), "bilinear")
    got = resize_bilinear(x, (s_out, s_out), spatial_axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s_in,s_out", [(8, 32), (7, 19), (16, 64)])
def test_align_corners_matches_gather_upsample(s_in, s_out):
    from simpleaicv_tpu.models.detection.fpn import _upsample_to
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, s_in, s_in, 5), jnp.float32)
    want = _upsample_to.__wrapped__(x, s_out, s_out) \
        if hasattr(_upsample_to, "__wrapped__") else None
    # reference formula computed directly (torch align_corners=True)
    xs_np = np.asarray(x)
    src = np.linspace(0.0, s_in - 1.0, s_out)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, s_in - 1)
    w = src - lo
    tmp = xs_np[:, lo] * (1 - w)[None, :, None, None] + \
        xs_np[:, hi] * w[None, :, None, None]
    want = tmp[:, :, lo] * (1 - w)[None, None, :, None] + \
        tmp[:, :, hi] * w[None, None, :, None]
    got = resize_bilinear(x, (s_out, s_out), spatial_axes=(1, 2),
                          align_corners=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mask_layout_bkhw():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 16, 16), jnp.float32)
    want = jax.image.resize(x, (1, 4, 64, 64), "bilinear")
    got = resize_bilinear(x, (64, 64), spatial_axes=(2, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_jax_image_resize():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
    ct = jnp.asarray(rng.randn(1, 24, 24, 2), jnp.float32)

    def f_ref(x):
        return jnp.sum(jax.image.resize(x, (1, 24, 24, 2), "bilinear") * ct)

    def f_new(x):
        return jnp.sum(resize_bilinear(x, (24, 24)) * ct)

    g_ref = jax.grad(f_ref)(x)
    g_new = jax.grad(f_new)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_identity_when_same_size():
    x = jnp.ones((2, 8, 8, 3))
    assert resize_bilinear(x, (8, 8)) is x


def test_bf16_passthrough_dtype():
    x = jnp.ones((2, 8, 8, 3), jnp.bfloat16)
    y = resize_bilinear(x, (16, 16))
    assert y.dtype == jnp.bfloat16


def test_nearest_2x_matches_jax():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    want = jax.image.resize(x, (2, 16, 16, 3), "nearest")
    got = upsample_nearest_2x(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
