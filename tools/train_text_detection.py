"""OCR text-detection (DBNet) training entrypoint (parity: reference
tools/train_text_detection_model.py + text_scripts.py:1675)."""

import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def make_loss_fn(model, criterion):

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        shapes = {k: batch[k] for k in
                  ("probability_mask", "probability_ignore_mask",
                   "threshold_mask", "threshold_ignore_mask")}
        if train and mutable:
            preds, new_vars = model.apply(variables, batch["image"], train,
                                          rngs=rngs, mutable=mutable)
        else:
            preds = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        loss_dict = criterion(preds, shapes)
        total = jnp.zeros((), jnp.float32)
        for v in loss_dict.values():
            total = total + v
        return total, (dict(loss_dict), new_vars)

    return loss_fn


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        """Per-epoch polygon P/R/F1 (reference text_scripts.py:1421-1674)."""
        del eval_step, shard_fn
        import jax
        import jax.numpy as jnp
        import numpy as np
        from simpleaicv_tpu.data.text_detection import DBNetDecoder
        from simpleaicv_tpu.evaluation.text_eval import \
            evaluate_text_detection

        model = config.model
        decoder = getattr(config, "decoder", None) or DBNetDecoder()
        forward = jax.jit(
            lambda p, sv, x: model.apply({"params": p, **sv}, x, False))
        results = []
        for batch in loader:
            preds = np.asarray(forward(params, state_vars,
                                       jnp.asarray(batch["image"])))
            for (boxes, _s), gt_polys in zip(decoder(preds), batch["polys"]):
                results.append({"pred_polys": list(boxes),
                                "gt_polys": list(gt_polys),
                                "gt_ignore": [False] * len(gt_polys)})
        stats = evaluate_text_detection(results)
        stats["key_metric"] = stats.get("f1", 0.0)
        return stats

    trainer = Trainer(config, args.work_dir, make_loss_fn=make_loss_fn)
    if getattr(config, "test_dataset", None) is not None:
        trainer.evaluate = evaluate
        trainer.eval_step = lambda *a, **k: None
    trainer.run()


if __name__ == "__main__":
    main()
