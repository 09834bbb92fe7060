"""DDIM sampler (parity: reference
simpleAICV/diffusion_model/diffusion_methods/ddim.py:24-230 — uniform/quad
timestep subsets (+1 shift), eta-scaled sigmas, clip_denoised). Reverse loop
is a jitted lax.scan over the DDIM steps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionConstants


class DDIMSampler:

    def __init__(self, beta_schedule_mode="linear", linear_beta_1=1e-4,
                 linear_beta_t=0.02, cosine_s=0.008, ddpm_t=1000, ddim_t=50,
                 ddim_eta=0.0, ddim_discr_method="uniform",
                 clip_denoised=True):
        assert ddim_discr_method in ("uniform", "quad")
        self.ddpm_t = ddpm_t
        self.ddim_t = ddim_t
        self.ddim_eta = ddim_eta
        self.clip_denoised = clip_denoised
        self.c = DiffusionConstants(beta_schedule_mode, ddpm_t, linear_beta_1,
                                    linear_beta_t, cosine_s)

        if ddim_discr_method == "uniform":
            step = ddpm_t // ddim_t
            timesteps = np.asarray(list(range(0, ddpm_t, step)))
        else:
            timesteps = (np.linspace(0, np.sqrt(ddpm_t * 0.8),
                                     ddim_t)**2).astype(int)
        self.ddim_timesteps = timesteps + 1

        ac = self.c.alphas_cumprod
        self.ddim_alphas = ac[np.clip(self.ddim_timesteps, 0, ddpm_t - 1)]
        self.ddim_alphas_prev = np.concatenate(
            [[ac[0]], self.ddim_alphas[:-1]])
        self.ddim_sigmas = ddim_eta * np.sqrt(
            (1 - self.ddim_alphas_prev) / (1 - self.ddim_alphas) *
            (1 - self.ddim_alphas / self.ddim_alphas_prev))
        self.ddim_sqrt_one_minus_alphas = np.sqrt(1.0 - self.ddim_alphas)

    def __call__(self, apply_fn, shape, rng, class_label=None,
                 input_images=None):
        rng, init_rng = jax.random.split(rng)
        x = (jax.random.normal(init_rng, shape, jnp.float32)
             if input_images is None else input_images)

        n_steps = len(self.ddim_timesteps)
        ts = jnp.asarray(self.ddim_timesteps[::-1].copy(), jnp.int32)
        a_t = jnp.asarray(self.ddim_alphas[::-1].copy(), jnp.float32)
        a_prev = jnp.asarray(self.ddim_alphas_prev[::-1].copy(), jnp.float32)
        sigma = jnp.asarray(self.ddim_sigmas[::-1].copy(), jnp.float32)
        sqrt_1m_a = jnp.asarray(self.ddim_sqrt_one_minus_alphas[::-1].copy(),
                                jnp.float32)

        def step(carry, xs):
            x, rng = carry
            t_scalar, at, ap, sg, s1a = xs
            rng, step_rng = jax.random.split(rng)
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            eps = apply_fn(x, t, class_label)
            x0 = (x - s1a * eps) / jnp.sqrt(at)
            if self.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            dir_xt = jnp.sqrt(jnp.clip(1.0 - ap - sg**2, 0.0, None)) * eps
            noise = jax.random.normal(step_rng, x.shape, x.dtype)
            x = jnp.sqrt(ap) * x0 + dir_xt + sg * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (x, rng),
                                 (ts, a_t, a_prev, sigma, sqrt_1m_a))
        return x
