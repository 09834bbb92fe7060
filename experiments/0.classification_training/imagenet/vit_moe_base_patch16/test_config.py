"""Eval config (pairs with tools/test_classification.py) — derives from the sibling
train_config so model/data definitions stay in sync; set
``trained_model_path`` to a checkpoint (e.g. ``checkpoints/best`` from
training, or a converted official checkpoint from
tools/convert_official_weights.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_config import config as _train  # noqa: E402


class config:
    network = _train.network
    input_image_size = getattr(_train, "input_image_size", None)
    model = _train.model
    trained_model_path = ""

    # explicit None checks: `x or y` would call __len__ (disk scan) at import
    test_dataset = getattr(_train, "test_dataset", None)
    if test_dataset is None:
        test_dataset = getattr(_train, "train_dataset", None)
    test_collater = getattr(_train, "test_collater", None)
    if test_collater is None:
        test_collater = getattr(_train, "train_collater", None)

    seed = getattr(_train, "seed", 0)
    batch_size = _train.batch_size
    num_workers = getattr(_train, "num_workers", 4)
