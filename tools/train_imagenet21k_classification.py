"""ImageNet-21K semantic-softmax training entrypoint (parity: reference
tools/train_imagenet21k_classification_model.py:55-152 — semantic hierarchy
outputs + SemanticSoftmaxLoss, accuracy = mean over hierarchies of per-level
top-1 on valid labels)."""

import jax
import jax.numpy as jnp
import numpy as np

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def build_adapters(config):
    ds = config.train_dataset
    ds._load_tree()
    hierarchy_idx = [jnp.asarray(i) for i in ds.hierarchy_indices_list]
    from simpleaicv_tpu.losses import SemanticSoftmaxLoss
    criterion = SemanticSoftmaxLoss(
        normalization_factor_list=[float(f)
                                   for f in ds.normalization_factor_list],
        smoothing=getattr(config, "smoothing", 0.1))

    def make_loss_fn(model, _c):

        def loss_fn(params, state_vars, batch, rng, train):
            variables = {"params": params, **state_vars}
            mutable = [k for k in state_vars] if train else False
            rngs = {"dropout": rng}
            if train and mutable:
                out, new_vars = model.apply(variables, batch["image"], train,
                                            rngs=rngs, mutable=mutable)
            else:
                out = model.apply(variables, batch["image"], train, rngs=rngs)
                new_vars = state_vars
            semantic_outputs = [out[:, idx] for idx in hierarchy_idx]
            loss = criterion(semantic_outputs, batch["semantic_label"])
            return loss, ({}, new_vars)

        return loss_fn

    def make_eval_fn(model):

        def eval_fn(params, state_vars, batch, rng, train):
            del rng, train
            variables = {"params": params, **state_vars}
            out = model.apply(variables, batch["image"], False)
            correct = jnp.zeros((), jnp.float32)
            total = jnp.zeros((), jnp.float32)
            for level, idx in enumerate(hierarchy_idx):
                level_logits = out[:, idx]
                pred = jnp.argmax(level_logits, -1)
                lab = batch["semantic_label"][:, level]
                valid = (lab >= 0).astype(jnp.float32)
                correct += jnp.sum((pred == lab).astype(jnp.float32) * valid)
                total += jnp.sum(valid)
            return {"acc1_correct": correct, "acc5_correct": correct,
                    "n": total}

        return eval_fn

    return make_loss_fn, make_eval_fn


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    make_loss_fn, make_eval_fn = build_adapters(config)
    from simpleaicv_tpu.tasks import classification
    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn,
                      make_eval_fn=make_eval_fn,
                      evaluate=classification.evaluate)
    trainer.run()


if __name__ == "__main__":
    main()
