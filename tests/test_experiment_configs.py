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


TEST_CONFIGS = sorted(
    os.path.join(root, "test_config.py")
    for root, _dirs, files in os.walk(EXP)
    if "test_config.py" in files)


def test_every_experiment_has_test_config():
    """Reference pairs every experiment with a test config (SURVEY §1 L5);
    so do we."""
    train_dirs = {os.path.dirname(p) for p in CONFIGS}
    test_dirs = {os.path.dirname(p) for p in TEST_CONFIGS}
    missing = sorted(os.path.relpath(d, EXP) for d in train_dirs - test_dirs)
    assert not missing, missing


@pytest.mark.parametrize("path", TEST_CONFIGS,
                         ids=[os.path.relpath(p, EXP) for p in TEST_CONFIGS])
def test_test_config_imports(path):
    work_dir = os.path.dirname(path)
    sys.path.insert(0, work_dir)
    for m in ("train_config", "test_config"):
        sys.modules.pop(m, None)
    try:
        mod = importlib.import_module("test_config")
        config = mod.config
        assert hasattr(config, "model")
        assert hasattr(config, "batch_size")
        assert hasattr(config, "trained_model_path")
        assert config.test_dataset is not None or \
            "fake_synthetic" in path or "diffusion" in path
        assert config.test_collater is not None or "diffusion" in path
    finally:
        sys.path.remove(work_dir)
        for m in ("train_config", "test_config"):
            sys.modules.pop(m, None)
