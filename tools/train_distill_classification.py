"""Distillation training entrypoint (parity: reference
tools/train_distill_classification_model.py + tools/scripts.py:283-452)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import classification, distillation


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    criterion_list = distillation.build_criterion_list(config.loss_list)

    def make_loss_fn(model, _criterion):
        return distillation.make_loss_fn(model, criterion_list)

    def make_eval_fn(model):
        # evaluate the student head (index 1 of (tea, stu))
        import jax.numpy as jnp

        def eval_fn(params, state_vars, batch, rng, train):
            del rng, train
            variables = {"params": params, **state_vars}
            _, stu = model.apply(variables, batch["image"], False)
            labels = batch["label"]
            top5 = jnp.argsort(stu, axis=-1)[:, -5:]
            valid = (labels >= 0).astype(jnp.float32)
            return {
                "acc1_correct": jnp.sum(
                    (top5[:, -1] == labels).astype(jnp.float32) * valid),
                "acc5_correct": jnp.sum(jnp.any(
                    top5 == labels[:, None], -1).astype(jnp.float32) * valid),
                "n": jnp.sum(valid),
            }

        return eval_fn

    config.train_criterion = None
    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn,
                      make_eval_fn=make_eval_fn,
                      evaluate=classification.evaluate)
    trainer.run()


if __name__ == "__main__":
    main()
