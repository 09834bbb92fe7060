"""Detection training entrypoint (parity: reference
tools/train_detection_model.py). Same --work-dir config surface."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import detection


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    config = load_config(args.work_dir)
    s = config.input_image_size

    import jax.numpy as jnp
    init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        return detection.evaluate_coco(config.model, params, state_vars,
                                       config.decoder, loader,
                                       config.num_classes)

    has_eval = getattr(config, "test_dataset", None) is not None and \
        getattr(config, "decoder", None) is not None
    trainer = Trainer(config, args.work_dir,
                      make_loss_fn=detection.make_loss_fn,
                      make_eval_fn=None,
                      evaluate=evaluate if has_eval else None,
                      init_batch=init_batch)
    trainer.run()


if __name__ == "__main__":
    main()
