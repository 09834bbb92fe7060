"""End-to-end learning: the full Trainer stack converges to ~100% accuracy
on a separable synthetic task.

This is the offline-env stand-in for the reference's results.md accuracy
tables (no datasets on disk here): it asserts that the whole user-facing
path — config object -> Trainer (mesh, loader, SPMD train step, optimizer +
schedule, EMA, NaN-skip, per-epoch eval, best checkpoint) — actually LEARNS,
not merely runs. Smoke tests (tools/run_synthetic_smokes.py) cover "runs";
golden tests cover per-op math; this covers the training dynamics.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from simpleaicv_tpu.core.registry import LOSSES
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.data.collater import ClassificationCollater
from simpleaicv_tpu.data.datasets import LearnableClassificationDataset
from simpleaicv_tpu.tasks import classification


class SmallConvNet(nn.Module):
    """Tiny conv net (conv-BN-relu x2 + GAP + dense): enough capacity for
    the template task, small enough for a fast CPU-mesh test."""
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for width in (16, 32):
            x = nn.Conv(width, (3, 3), strides=(2, 2), use_bias=False)(x)
            # fast-converging running stats: only ~40 updates in this test
            x = nn.BatchNorm(use_running_average=not train, momentum=0.7)(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def _make_config(tmp_path, use_ema):
    class config:
        network = "smallconvnet"
        num_classes = 4
        input_image_size = 32
        model = SmallConvNet(num_classes=4)
        trained_model_path = ""
        train_criterion = LOSSES.create("CELoss")
        test_criterion = LOSSES.create("CELoss")
        train_dataset = LearnableClassificationDataset(
            num_samples=256, image_hw=32, num_classes=4, set_name="train")
        test_dataset = LearnableClassificationDataset(
            num_samples=64, image_hw=32, num_classes=4, set_name="val")
        train_collater = ClassificationCollater()
        test_collater = ClassificationCollater()
        seed = 0
        batch_size = 32
        num_workers = 2
        accumulation_steps = 1
        use_ema_model = use_ema
        ema_model_decay = 0.9
        epochs = 5
        print_interval = 8
        optimizer = ("SGD", {"lr": 0.2, "momentum": 0.9,
                             "weight_decay": 1e-4,
                             "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0})

    return config


@pytest.mark.parametrize("use_ema", [False, True])
def test_trainer_converges_on_separable_task(tmp_path, use_ema):
    work_dir = tmp_path / ("ema" if use_ema else "plain")
    work_dir.mkdir()
    trainer = Trainer(_make_config(tmp_path, use_ema), str(work_dir),
                      make_loss_fn=classification.make_loss_fn,
                      make_eval_fn=classification.make_eval_fn,
                      evaluate=classification.evaluate)
    best_acc1 = trainer.run()
    # 4 well-separated class templates, 3 epochs: near-perfect accuracy.
    assert best_acc1 >= 90.0, best_acc1
    # best checkpoint written and loadable
    ckpts = list((work_dir / "checkpoints").iterdir())
    assert any("best" in p.name or "metric" in p.name for p in ckpts), ckpts
    # the eval'd params (EMA when enabled) really produce that accuracy
    metrics = classification.evaluate(
        trainer.eval_step, trainer.eval_params(), trainer.state.state_vars,
        trainer.test_loader, trainer.shard)
    assert metrics["acc1"] >= 90.0, metrics
