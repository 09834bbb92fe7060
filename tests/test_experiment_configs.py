"""Every experiment config must import cleanly without touching the
filesystem (datasets are lazy) — the reference's configs eagerly scan disk at
import; ours must not."""

import importlib
import os
import sys

import pytest

import simpleaicv_tpu  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(REPO, "experiments")

CONFIGS = sorted(
    os.path.join(root, "train_config.py")
    for root, _dirs, files in os.walk(EXP)
    if "train_config.py" in files)


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.relpath(p, EXP) for p in CONFIGS])
def test_config_imports(path):
    work_dir = os.path.dirname(path)
    sys.path.insert(0, work_dir)
    sys.modules.pop("train_config", None)
    try:
        mod = importlib.import_module("train_config")
        config = mod.config
        assert hasattr(config, "optimizer")
        assert hasattr(config, "scheduler")
        assert hasattr(config, "epochs")
        assert hasattr(config, "batch_size")
    finally:
        sys.path.remove(work_dir)
        sys.modules.pop("train_config", None)
