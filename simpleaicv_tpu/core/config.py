"""Experiment-config loading: same UX as the reference.

An experiment is a directory containing ``train_config.py`` (and optionally
``test_config.py``) exposing ``class config`` whose class attributes define the
experiment (reference tools/train_classification_model.py:38-39). Unlike the
reference, our datasets/checkpoint-loads are lazy, so importing a config never
touches the filesystem.
"""

from __future__ import annotations

import importlib
import os
import sys


def load_config(work_dir: str, module_name: str = "train_config"):
    work_dir = os.path.abspath(work_dir)
    if work_dir not in sys.path:
        sys.path.insert(0, work_dir)
    if module_name in sys.modules:
        mod = importlib.reload(sys.modules[module_name])
    else:
        mod = importlib.import_module(module_name)
    return mod.config


def config_repr(config) -> str:
    rows = []
    for k in dir(config):
        if k.startswith("_"):
            continue
        v = getattr(config, k)
        rows.append(f"  {k}: {v!r}"[:200])
    return "config:\n" + "\n".join(rows)
