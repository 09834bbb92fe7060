"""Exponential moving average of parameters.

Parity with reference ``EmaModel`` (tools/utils.py:136-163): per-step
``ema = decay * ema + (1 - decay) * params`` with default decay 0.9999; the EMA
params are used for eval / best-checkpoint when ``use_ema_model`` is set
(tools/scripts.py:34-35, tools/train_classification_model.py:213-215).

TPU-first: a pure tree-map fused into the jitted train step (no model copy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params, params, decay: float = 0.9999):
    d = jnp.asarray(decay, jnp.float32)
    return jax.tree.map(
        lambda e, p: (d * e.astype(jnp.float32) +
                      (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params, params)
