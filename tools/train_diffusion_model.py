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

    raw_model = config.model
    sample_grid_n = getattr(config, "eval_sample_grid", 16)
    generate = None
    if getattr(config, "sampler", None) is not None and sample_grid_n:
        generate = diffusion.make_generate_fn(raw_model, config.sampler,
                                              (sample_grid_n, s, s, 3))

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        """Per-epoch sample grid (reference generate_diffusion_model_images,
        tools/diffusion_scripts.py:19) — saved under <work_dir>/samples so
        training quality is observable; key_metric stays -loss (matching the
        reference's loss-based best checkpoint for diffusion)."""
        del eval_step, loader, shard_fn
        import cv2
        import jax
        import numpy as np
        side = int(sample_grid_n**0.5)
        imgs = np.asarray(generate(params, state_vars,
                                   jax.random.PRNGKey(trainer_ref[0])))
        trainer_ref[0] += 1
        imgs = ((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
        rows = imgs[:side * side].reshape(side, side, s, s, 3).transpose(
            0, 2, 1, 3, 4).reshape(side * s, side * s, 3)
        out_dir = os.path.join(args.work_dir, "samples")
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, f"grid_{trainer_ref[0]:04d}.png"),
                    cv2.cvtColor(rows, cv2.COLOR_RGB2BGR))
        return {"sample_grids_saved": float(trainer_ref[0])}

    trainer_ref = [0]
    if generate is not None:
        evaluate.needs_loader = False

    config.model = _Wrap(config.model)
    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn,
                      evaluate=evaluate if generate is not None else None,
                      init_batch=init_batch)
    trainer.run()


if __name__ == "__main__":
    main()
