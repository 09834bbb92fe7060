"""MACs/params reporting (parity: reference thop-based
compute_macs_and_params, tools/utils.py:116-133 — reported at test time for
every model in results.md).

TPU-native: params from the pytree; FLOPs from XLA's own cost analysis of the
jitted forward (what actually runs on the chip, not a per-module estimate);
MACs reported as FLOPs/2 to match thop's convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def compute_macs_and_params(apply_fn, variables, example_input):
    """Returns (macs, params). apply_fn(variables, x) -> output."""
    params = variables.get("params", variables)
    n_params = count_params(params)
    try:
        lowered = jax.jit(lambda v, x: apply_fn(v, x)).lower(variables,
                                                             example_input)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return flops / 2.0, n_params


def format_macs_params(macs: float, params: int) -> str:
    def fmt(v, suffixes=("", "K", "M", "G", "T")):
        for s in suffixes:
            if abs(v) < 1000:
                return f"{v:.3f}{s}"
            v /= 1000
        return f"{v:.3f}P"

    return f"macs: {fmt(macs)}, params: {fmt(float(params))}"
