"""DDPM trainer + sampler (parity: reference
simpleAICV/diffusion_model/diffusion_methods/ddpm.py:24-81 (trainer: t~U[0,T),
q-sample, noise-pred target) and :83-280 (sampler: mean_type xprev/xstart/
epsilon, var fixedlarge/fixedsmall, clip_denoised)).

TPU-first: the reverse loop is a jitted ``lax.scan`` over all T steps — one
compiled program instead of T python-dispatched model calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionConstants


def _extract(v, t, ndim):
    """Gather schedule constants at timesteps t -> [B,1,1,...]."""
    out = jnp.asarray(v, jnp.float32)[t]
    return out.reshape((t.shape[0],) + (1,) * (ndim - 1))


class DDPMTrainer:

    def __init__(self, beta_schedule_mode="linear", linear_beta_1=1e-4,
                 linear_beta_t=0.02, cosine_s=0.008, t=1000):
        self.t = t
        self.c = DiffusionConstants(beta_schedule_mode, t, linear_beta_1,
                                    linear_beta_t, cosine_s)

    def add_noise(self, x_start, t, noise):
        nd = x_start.ndim
        return (_extract(self.c.sqrt_alphas_cumprod, t, nd) * x_start +
                _extract(self.c.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def __call__(self, apply_fn, x_start, rng, class_label=None):
        """Returns (pred_noise, noise). apply_fn(x_noisy, t, class_label)."""
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (x_start.shape[0],), 0, self.t)
        noise = jax.random.normal(n_rng, x_start.shape, x_start.dtype)
        x_noisy = self.add_noise(x_start, t, noise)
        pred = apply_fn(x_noisy, t, class_label)
        return pred, noise


class DDPMSampler:

    def __init__(self, beta_schedule_mode="linear", linear_beta_1=1e-4,
                 linear_beta_t=0.02, cosine_s=0.008, t=1000,
                 mean_type="epsilon", var_type="fixedsmall",
                 clip_denoised=True):
        assert mean_type in ("xprev", "xstart", "epsilon")
        assert var_type in ("fixedlarge", "fixedsmall")
        self.t = t
        self.mean_type = mean_type
        self.var_type = var_type
        self.clip_denoised = clip_denoised
        self.c = DiffusionConstants(beta_schedule_mode, t, linear_beta_1,
                                    linear_beta_t, cosine_s)

    def _p_mean_log_variance(self, pred, x_t, t):
        c = self.c
        nd = x_t.ndim
        if self.mean_type == "xprev":
            x_prev = pred
            x_0 = (_extract(1.0 / c.posterior_mean_coef1, t, nd) * x_prev -
                   _extract(c.posterior_mean_coef2 / c.posterior_mean_coef1,
                            t, nd) * x_t)
            model_mean = x_prev
        elif self.mean_type == "xstart":
            x_0 = pred
            if self.clip_denoised:
                x_0 = jnp.clip(x_0, -1.0, 1.0)
            model_mean = (_extract(c.posterior_mean_coef1, t, nd) * x_0 +
                          _extract(c.posterior_mean_coef2, t, nd) * x_t)
        else:  # epsilon
            eps = pred
            x_0 = (_extract(c.sqrt_recip_alphas_cumprod, t, nd) * x_t -
                   _extract(c.sqrt_recipm1_alphas_cumprod, t, nd) * eps)
            if self.clip_denoised:
                x_0 = jnp.clip(x_0, -1.0, 1.0)
            model_mean = (_extract(c.posterior_mean_coef1, t, nd) * x_0 +
                          _extract(c.posterior_mean_coef2, t, nd) * x_t)

        if self.var_type == "fixedlarge":
            log_var_sched = np.log(np.concatenate(
                [c.posterior_variance[1:2], c.betas[1:]]))
        else:
            log_var_sched = c.posterior_log_variance_clipped
        return model_mean, _extract(log_var_sched, t, nd)

    def sample_per_time_step(self, apply_fn, x_t, t, rng, class_label=None):
        pred = apply_fn(x_t, t, class_label)
        mean, log_var = self._p_mean_log_variance(pred, x_t, t)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (-1,) + (1,) * (x_t.ndim - 1))
        return mean + jnp.exp(0.5 * log_var) * noise * nonzero

    def __call__(self, apply_fn, shape, rng, class_label=None,
                 input_images=None):
        """Full reverse process as one lax.scan. Returns final images."""
        rng, init_rng = jax.random.split(rng)
        x = (jax.random.normal(init_rng, shape, jnp.float32)
             if input_images is None else input_images)

        def step(carry, time_step):
            x, rng = carry
            rng, step_rng = jax.random.split(rng)
            t = jnp.full((shape[0],), time_step, jnp.int32)
            x = self.sample_per_time_step(apply_fn, x, t, step_rng,
                                          class_label)
            return (x, rng), None

        timesteps = jnp.arange(self.t - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, rng), timesteps)
        return x
