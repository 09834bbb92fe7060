"""Official-weight converters (parity: reference
simpleAICV/classification/weight_convert/ — 7 per-family scripts converting
torchvision / official-MAE / metaformer / sapiens checkpoints).

Each converter maps an official torch ``state_dict`` into our flax variable
tree ({'params': ..., 'batch_stats': ...}) with layout conversion
(conv OIHW->HWIO, linear [out,in]->[in,out], BN weight->scale,
running_mean/var->batch_stats) and per-family module-path rewrites. The
result goes through ``load_state_dict_partial`` (shape filter + pos-embed
bicubic resize), mirroring the reference's shape-filtered load
(simpleAICV/classification/common.py:758-840).

Families:
  torchvision_resnet  conv1/bn1/layerS.B.convJ/downsample -> stem/layerS_B/...
  mae_vit             official MAE ('model' sub-dict): blocks.N.attn.qkv ...
  convformer          metaformer-baselines naming: stages.N.M.token_mixer ...
  inception_v3        torchvision inception (FID/IS backbone) — same module
                      names, layout conversion only
  sapiens_vit         mmpretrain-style sapiens ViT encoders
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .checkpoint import load_state_dict_partial

__all__ = ["convert_official_state_dict", "apply_converted", "FAMILIES"]


def _to_jax_layout(path: str, suffix: str, arr: np.ndarray
                   ) -> Tuple[str, str, np.ndarray]:
    """Returns (collection, our_suffix, converted array)."""
    if suffix == "running_mean":
        return "batch_stats", "mean", arr
    if suffix == "running_var":
        return "batch_stats", "var", arr
    if suffix == "bias":
        return "params", "bias", arr
    if suffix == "weight":
        if arr.ndim == 4:                       # conv OIHW -> HWIO
            return "params", "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:                       # linear [o,i] -> [i,o]
            return "params", "kernel", arr.T
        return "params", "scale", arr           # BN/LN affine
    return "params", suffix, arr                # cls_token, pos_embed, ...


_RESNET_RULES = [
    (r"^conv1$", "stem/conv"),
    (r"^bn1$", "stem/bn"),
    (r"^layer(\d+)\.(\d+)\.conv(\d+)$", r"layer\1_\2/conv\3/conv"),
    (r"^layer(\d+)\.(\d+)\.bn(\d+)$", r"layer\1_\2/conv\3/bn"),
    (r"^layer(\d+)\.(\d+)\.downsample\.0$", r"layer\1_\2/downsample/conv"),
    (r"^layer(\d+)\.(\d+)\.downsample\.1$", r"layer\1_\2/downsample/bn"),
    (r"^fc$", "fc"),
]

_MAE_VIT_RULES = [
    (r"^cls_token$", "cls_token"),
    (r"^pos_embed$", "position_encoding"),
    (r"^patch_embed\.proj$", "patch_embedding"),
    (r"^blocks\.(\d+)\.(norm\d)$", r"blocks_\1/\2"),
    (r"^blocks\.(\d+)\.attn\.(qkv|proj)$", r"blocks_\1/attn/\2"),
    (r"^blocks\.(\d+)\.mlp\.(fc\d)$", r"blocks_\1/mlp/\2"),
    (r"^(fc_)?norm$", "norm"),
    (r"^head$", "fc"),
]

_CONVFORMER_RULES = [
    (r"^downsample_layers\.(\d+)\.(conv|pre_norm|post_norm)$",
     r"downsample_layers_\1/\2"),
    (r"^stages\.(\d+)\.(\d+)\.token_mixer\.(dwconv|pwconv\d)$",
     r"stages_\1_\2/token_mixer/\3"),
    (r"^stages\.(\d+)\.(\d+)\.(norm\d)$", r"stages_\1_\2/\3"),
    (r"^stages\.(\d+)\.(\d+)\.mlp\.(fc\d)$", r"stages_\1_\2/mlp/\3"),
    (r"^(norm_head|norm)$", "norm"),
    (r"^head(\.fc\d)?$", "head"),
]

_INCEPTION_RULES = [
    (r"^(.*)$", lambda m: m.group(1).replace(".", "/")),
]

# sapiens (mmpretrain ViT): layers.N.{ln1,ln2}, attn.qkv/proj, ffn.layers.0.0
# / ffn.layers.1 linears; patch_embed.projection; pos_embed (no cls token)
_SAPIENS_RULES = [
    (r"^(backbone\.)?cls_token$", "cls_token"),
    (r"^(backbone\.)?pos_embed$", "position_encoding"),
    (r"^(backbone\.)?patch_embed\.projection$", "patch_embedding"),
    (r"^(backbone\.)?layers\.(\d+)\.ln1$", r"blocks_\2/norm1"),
    (r"^(backbone\.)?layers\.(\d+)\.ln2$", r"blocks_\2/norm2"),
    (r"^(backbone\.)?layers\.(\d+)\.attn\.(qkv|proj)$", r"blocks_\2/attn/\3"),
    (r"^(backbone\.)?layers\.(\d+)\.ffn\.layers\.0\.0$", r"blocks_\2/mlp/fc1"),
    (r"^(backbone\.)?layers\.(\d+)\.ffn\.layers\.1$", r"blocks_\2/mlp/fc2"),
    (r"^(backbone\.)?ln1$", "norm"),
    (r"^head$", "fc"),
]

FAMILIES = {
    "torchvision_resnet": _RESNET_RULES,
    "mae_vit": _MAE_VIT_RULES,
    "convformer": _CONVFORMER_RULES,
    "inception_v3": _INCEPTION_RULES,
    "sapiens_vit": _SAPIENS_RULES,
}


def _rewrite(module_path: str, rules) -> str | None:
    for pat, repl in rules:
        m = re.match(pat, module_path)
        if m:
            return m.expand(repl) if isinstance(repl, str) else repl(m)
    return None


def convert_official_state_dict(sd: Dict[str, np.ndarray], family: str
                                ) -> Dict[str, dict]:
    """state_dict -> {'params': nested, 'batch_stats': nested}. Unmatched
    keys are dropped (the reference converters do the same by key filter)."""
    rules = FAMILIES[family]
    out = {"params": {}, "batch_stats": {}}
    for key, arr in sd.items():
        arr = np.asarray(arr)
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.rsplit(".", 1)
        if len(parts) == 2 and parts[1] in ("weight", "bias", "running_mean",
                                            "running_var"):
            module_path, suffix = parts
        else:
            module_path, suffix = key, ""
        target = _rewrite(module_path, rules)
        if target is None:
            continue
        if suffix:
            coll, our_suffix, arr = _to_jax_layout(target, suffix, arr)
            flat_path = f"{target}/{our_suffix}"
        else:  # whole-tensor params like cls_token / pos_embed
            coll, flat_path = "params", target
        node = out[coll]
        ps = flat_path.split("/")
        for p in ps[:-1]:
            node = node.setdefault(p, {})
        node[ps[-1]] = arr
    return out


def apply_converted(variables: dict, converted: dict) -> Tuple[dict, int]:
    """Merge a converted tree into model variables; returns (vars, n)."""
    out = dict(variables)
    total = 0
    for coll in ("params", "batch_stats"):
        if coll in variables and converted.get(coll):
            out[coll], n = load_state_dict_partial(converted[coll],
                                                   variables[coll])
            total += n
    return out, total


def convert_torch_file(path: str, family: str) -> Dict[str, dict]:
    from .weight_convert import load_torch_state_dict
    return convert_official_state_dict(load_torch_state_dict(path), family)
