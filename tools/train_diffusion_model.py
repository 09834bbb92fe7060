"""Diffusion training entrypoint (parity: reference
tools/train_diffusion_model.py — loss-only training; sampling/FID live in
tools/test_diffusion_model.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import diffusion


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    config = load_config(args.work_dir)
    s = config.input_image_size
    init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}

    def make_loss_fn(model, criterion):
        return diffusion.make_loss_fn(
            model, criterion, config.trainer,
            num_classes=getattr(config, "num_classes", None),
            class_label_drop_prob=getattr(config, "class_label_drop_prob",
                                          0.0))

    # the UNet takes (x, t, class_label, train) — provide a matching init
    class _Wrap:
        def __init__(self, m):
            self._m = m

        def init(self, rngs, x, train):
            return self._m.init(rngs, x, jnp.zeros((x.shape[0],), jnp.int32),
                                None, train)

        def apply(self, *a, **k):
            return self._m.apply(*a, **k)

    config.model = _Wrap(config.model)
    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn,
                      init_batch=init_batch)
    trainer.run()


if __name__ == "__main__":
    main()
