"""Full-SAM distillation entrypoint (parity: reference
tools/train_interactive_segmentation_distill_model.py +
interactive_segmentation_scripts.py:570 train_distill_sam_model — frozen
teacher SAM and trainable student run the same image+prompts; focal+dice on
teacher-binarized masks, MSE on iou predictions)."""

import jax
import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def make_loss_fn(model, criterion):

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        prompts = {"prompt_point": batch.get("prompt_point"),
                   "prompt_box": batch.get("prompt_box"),
                   "prompt_mask": None}
        if train and mutable:
            (tea, stu), new_vars = model.apply(
                variables, batch["image"], prompts, (0, 1, 2, 3), train,
                rngs=rngs, mutable=mutable)
        else:
            tea, stu = model.apply(variables, batch["image"], prompts,
                                   (0, 1, 2, 3), train, rngs=rngs)
            new_vars = state_vars
        loss_dict = criterion(tea, stu)
        total = jnp.zeros((), jnp.float32)
        for v in loss_dict.values():
            total = total + v
        return total, (dict(loss_dict), new_vars)

    return loss_fn


class SAMFullDistillTrainer(Trainer):

    def _init_variables(self, model, rng, init_batch):
        prompts = {
            "prompt_point": jnp.full((2, 9, 3), -1.0),
            "prompt_box": jnp.zeros((2, 4)),
            "prompt_mask": None,
        }

        @jax.jit
        def _init(r, image, pr):
            return model.init({"params": r, "dropout": r}, image, pr,
                              (0, 1, 2, 3), True)
        return _init(rng, init_batch["image"], prompts)


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    s = config.input_image_size
    init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}
    SAMFullDistillTrainer(config, args.work_dir, make_loss_fn=make_loss_fn,
                          init_batch=init_batch).run()


if __name__ == "__main__":
    main()
