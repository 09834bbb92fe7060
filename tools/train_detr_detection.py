"""DETR-family training entrypoint (parity: reference train_detection_model
with DETRDetectionCollater inputs; covers DETR and DINO-DETR)."""

import jax
import jax.numpy as jnp
import numpy as np

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import detection


class DETRTrainer(Trainer):

    def _init_variables(self, model, rng, init_batch):
        s = self.config.input_image_size
        images = init_batch["image"]
        if hasattr(model, "dn_number"):  # DINO-DETR: init WITH dn queries
            m = getattr(self.config, "max_annots_num", 8)
            ann = np.full((images.shape[0], m, 5), -1.0, np.float32)
            ann[:, 0] = [0.5, 0.5, 0.2, 0.2, 0]
            @jax.jit
            def _init_dn(r, img, a):
                return model.init({"params": r, "dropout": r, "dn": r},
                                  img, a, True)
            return _init_dn(rng, images, jnp.asarray(ann))
        masks = jnp.zeros(images.shape[:3])

        @jax.jit
        def _init(r, img, mk):
            return model.init({"params": r, "dropout": r}, img, mk, True)
        return _init(rng, images, masks)


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        """Per-epoch COCO eval via the shared detection evaluator (reference
        validates every epoch, tools/scripts.py:836; best ckpt on mAP)."""
        del eval_step, shard_fn
        return detection.evaluate_coco(config.model, params, state_vars,
                                       config.decoder, loader,
                                       config.num_classes)

    has_eval = getattr(config, "test_dataset", None) is not None and \
        getattr(config, "decoder", None) is not None
    DETRTrainer(config, args.work_dir,
                make_loss_fn=detection.make_detr_loss_fn,
                evaluate=evaluate if has_eval else None).run()


if __name__ == "__main__":
    main()
