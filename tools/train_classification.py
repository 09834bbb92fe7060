"""Classification training entrypoint.

Same CLI surface as the reference (tools/train_classification_model.py):
    python tools/train_classification.py --work-dir <experiment dir>
where the experiment dir holds train_config.py exposing ``class config``.
Launch is single-process SPMD (no torchrun); multi-host runs call
``jax.distributed.initialize`` first (set JAX_COORDINATOR_ADDRESS etc.).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import classification


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    config = load_config(args.work_dir)
    trainer = Trainer(config, args.work_dir,
                      make_loss_fn=classification.make_loss_fn,
                      make_eval_fn=classification.make_eval_fn,
                      evaluate=classification.evaluate)
    trainer.run()


if __name__ == "__main__":
    main()
