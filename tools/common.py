"""Shared CLI plumbing for the tools/ entrypoints."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

from simpleaicv_tpu.core.config import load_config  # noqa: E402


def parse_work_dir(description=""):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def load_train_config(args):
    return load_config(args.work_dir, "train_config")


def load_test_config(args):
    return load_config(args.work_dir, "test_config")


def restore_trained_params(ckpt_path, init_params):
    """Restore a best/named-final checkpoint ({'params', 'metric'}) onto the
    freshly-initialized param tree so restore works regardless of how many
    devices the checkpoint was saved with (Orbax refuses a target-less
    restore when the device set changed).

    Checkpoints may hold train-only parameter subtrees the eval-mode model
    never creates (e.g. DINO-DETR's denoising ``label_encoder``); those are
    restored onto metadata-derived placeholders and dropped, mirroring the
    reference's name-filtered ``load_state_dict``
    (simpleAICV/classification/common.py:758-840)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    try:
        payload = ckpt.restore(ckpt_path, {
            "params": init_params, "metric": jnp.zeros((), jnp.float32)})
        return payload["params"]
    except BaseException:
        pass
    try:
        payload = ckpt.restore(ckpt_path, {"params": init_params})
        return payload["params"]
    except BaseException:
        pass
    # structure mismatch: build the target from checkpoint metadata, taking
    # the initialized arrays where paths intersect and shape/dtype structs
    # for checkpoint-only leaves; then keep only the init tree's paths.
    meta = ckpt.metadata(ckpt_path)
    meta_tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    init_by_path = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(init_params)[0]}

    def target_leaf(kp, m):
        key = jax.tree_util.keystr(kp)
        full = "['params']"
        if key.startswith(full):
            key = key[len(full):]
        if key in init_by_path:
            return init_by_path[key]
        return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype)

    target = jax.tree_util.tree_map_with_path(target_leaf, meta_tree)
    payload = ckpt.restore(ckpt_path, target)
    restored = payload["params"] if isinstance(payload, dict) and \
        "params" in payload else payload
    rest_by_path = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(restored)[0]}
    return jax.tree_util.tree_map_with_path(
        lambda kp, v: rest_by_path.get(jax.tree_util.keystr(kp), v),
        init_params)
