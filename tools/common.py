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
    restore when the device set changed)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    try:
        payload = ckpt.restore(ckpt_path, {
            "params": init_params, "metric": jnp.zeros((), jnp.float32)})
    except BaseException:
        payload = ckpt.restore(ckpt_path, {"params": init_params})
    return payload["params"]
