"""Torch-checkpoint -> JAX weight conversion.

Replaces the reference's ``weight_convert/`` scripts (7 converters for
torchvision/MAE/DINOv2/sapiens weights) with one generic converter: it loads a
.pth state_dict (torch is available CPU-side in this environment), maps names
through per-architecture rules, transposes conv kernels OIHW->HWIO and linear
kernels [out,in]->[in,out], then hands the result to
``load_state_dict_partial`` (shape filter + pos-embed resize).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import numpy as np

from .checkpoint import load_state_dict_partial


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "ema_model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def torch_tensor_to_jax(name: str, arr: np.ndarray) -> np.ndarray:
    """Layout conversion by rank/name: conv OIHW->HWIO, linear [o,i]->[i,o]."""
    if arr.ndim == 4:
        return arr.transpose(2, 3, 1, 0)
    if arr.ndim == 2 and not name.endswith("embedding"):
        return arr.T
    return arr


def convert_torch_checkpoint(path: str, model_params,
                             name_map: Optional[Callable[[str],
                                                         Optional[str]]] = None):
    """Returns (new_params, n_loaded). ``name_map`` maps a torch param name to
    our flattened 'a/b/c' path (None = drop)."""
    sd = load_torch_state_dict(path)
    flat = {}
    for k, v in sd.items():
        target = name_map(k) if name_map else default_name_map(k)
        if target is None:
            continue
        flat_key = target
        node = flat
        parts = flat_key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = torch_tensor_to_jax(k, v)
    return load_state_dict_partial(flat, model_params)


_SUFFIX_MAP = {
    "weight": "kernel",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def default_name_map(torch_name: str) -> Optional[str]:
    """Generic mapping: dots->slashes, torch suffixes to flax naming. BN
    weight/bias become scale/bias; conv/linear weight becomes kernel."""
    if torch_name.endswith("num_batches_tracked"):
        return None
    parts = torch_name.split(".")
    suffix = parts[-1]
    head = "/".join(parts[:-1])
    if suffix in ("running_mean", "running_var"):
        return f"{head}/{_SUFFIX_MAP[suffix]}"
    if suffix == "weight":
        return f"{head}/kernel"
    return f"{head}/{suffix}"
