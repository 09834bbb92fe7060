"""Diffusion: schedule golden vs torch restatement, UNet shapes, sampler scan
runs and respects determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.diffusion import (DDPMTrainer, DDPMSampler, DDIMSampler,
                                      compute_beta_schedule)
from simpleaicv_tpu.models.diffusion_unet import DiffusionUNet


def test_beta_schedules_match_torch_formulas():
    torch = pytest.importorskip("torch")
    t = 100
    for mode in ("linear", "cosine", "quad", "sigmoid"):
        ours = compute_beta_schedule(mode, t)
        if mode == "linear":
            ref = torch.linspace(1e-4, 0.02, t, dtype=torch.float64).numpy()
        elif mode == "quad":
            ref = (torch.linspace(1e-4**0.5, 0.02**0.5, t,
                                  dtype=torch.float64)**2).numpy()
        elif mode == "sigmoid":
            ref = (torch.sigmoid(torch.linspace(-6, 6, t,
                                                dtype=torch.float64)) *
                   (0.02 - 1e-4) + 1e-4).numpy()
        else:
            import math
            x = torch.arange(t + 1, dtype=torch.float64)
            ac = torch.cos(((x / t) + 0.008) / 1.008 * math.pi * 0.5)**2
            ac = ac / ac[0]
            ref = torch.clip(1 - ac[1:] / ac[:-1], 0, 0.999).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_ddpm_add_noise_endpoints():
    tr = DDPMTrainer(t=1000)
    x = jnp.ones((2, 4, 4, 3))
    noise = jnp.zeros_like(x)
    t0 = jnp.zeros((2,), jnp.int32)
    near_x = tr.add_noise(x, t0, noise)
    np.testing.assert_allclose(np.asarray(near_x), np.asarray(x) *
                               tr.c.sqrt_alphas_cumprod[0], rtol=1e-5)
    t_last = jnp.full((2,), 999, jnp.int32)
    faded = tr.add_noise(x, t_last, noise)
    assert float(jnp.max(jnp.abs(faded))) < 0.3  # signal mostly gone


@pytest.fixture(scope="module")
def tiny_unet():
    model = DiffusionUNet(planes=32, planes_multi=(1, 2), block_nums=1,
                          num_groups=8, use_attention_planes_multi_idx=(1,))
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, None, False)
    return model, variables


def test_unet_shapes(tiny_unet):
    model, variables = tiny_unet
    x = jnp.zeros((2, 16, 16, 3))
    out = model.apply(variables, x, jnp.array([0, 500]), None, False)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_conditional_unet():
    model = DiffusionUNet(planes=32, planes_multi=(1, 2), block_nums=1,
                          num_groups=8, num_classes=10,
                          use_attention_planes_multi_idx=(1,))
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    labels = jnp.array([0, 3])
    variables = model.init(jax.random.PRNGKey(0), x, t, labels, False)
    out = model.apply(variables, x, t, labels, False)
    assert out.shape == (2, 16, 16, 3)


def test_samplers_run(tiny_unet):
    model, variables = tiny_unet

    def apply_fn(x, t, cl):
        return model.apply(variables, x, t, cl, False)

    ddpm = DDPMSampler(t=10)
    imgs = ddpm(apply_fn, (2, 16, 16, 3), jax.random.PRNGKey(0))
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    ddim = DDIMSampler(ddpm_t=100, ddim_t=10)
    imgs2 = ddim(apply_fn, (2, 16, 16, 3), jax.random.PRNGKey(0))
    assert imgs2.shape == (2, 16, 16, 3)
    # deterministic for eta=0 given same key
    imgs3 = ddim(apply_fn, (2, 16, 16, 3), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(imgs2), np.asarray(imgs3))
