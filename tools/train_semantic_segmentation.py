"""Semantic-segmentation training entrypoint (parity: reference
tools/train_semantic_segmentation_model.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import semantic_segmentation as seg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    config = load_config(args.work_dir)
    ignore_index = getattr(config, "ignore_index", 255)

    trainer = Trainer(
        config, args.work_dir,
        make_loss_fn=seg.make_loss_fn,
        make_eval_fn=lambda model: seg.make_eval_fn(
            model, config.num_classes, ignore_index),
        evaluate=seg.make_evaluate(config.num_classes, ignore_index))
    trainer.run()


if __name__ == "__main__":
    main()
