"""Instance-segmentation training entrypoint (parity: reference
tools/train_instance_segmentation_model.py + scripts.py:1563)."""

import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def make_loss_fn(model, criterion):

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            outs, new_vars = model.apply(variables, batch["image"], train,
                                         rngs=rngs, mutable=mutable)
        else:
            outs = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        loss_dict = criterion(outs, batch["annots"], batch["gt_masks"])
        total = jnp.zeros((), jnp.float32)
        for v in loss_dict.values():
            total = total + v
        return total, (dict(loss_dict), new_vars)

    return loss_fn


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    from simpleaicv_tpu.tasks import instance_segmentation as inst

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        return inst.evaluate_coco_segm(config.model, params, state_vars,
                                       config.decoder, loader,
                                       config.num_classes)

    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn)
    # mask-mAP eval needs the decoder; wire it like detection does
    if getattr(config, "test_dataset", None) is not None and \
            getattr(config, "decoder", None) is not None:
        trainer.evaluate = evaluate
        trainer.eval_step = lambda *a, **k: None
    trainer.run()


if __name__ == "__main__":
    main()
