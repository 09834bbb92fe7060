"""SAM encoder-distillation entrypoint (parity: reference
tools/train_interactive_segmentation_distill_encoder_model.py +
interactive_segmentation_scripts.py:195 — frozen SAM teacher encoder,
LightSAM student encoder, feature MSE)."""

import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


class DistillTrainer(Trainer):
    pass


def make_loss_fn(model, criterion):

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            (tea, stu), new_vars = model.apply(variables, batch["image"],
                                               train, rngs=rngs,
                                               mutable=mutable)
        else:
            tea, stu = model.apply(variables, batch["image"], train,
                                   rngs=rngs)
            new_vars = state_vars
        loss = criterion(stu, tea)
        return loss, ({}, new_vars)

    return loss_fn


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    DistillTrainer(config, args.work_dir, make_loss_fn=make_loss_fn).run()


if __name__ == "__main__":
    main()
