"""Detection task adapter (parity: reference tools/scripts.py:852-1052
train_detection + :694-836 evaluate_coco_detection).

The criterion returns a dict of named losses summed here (reference :918);
eval runs the jitted on-device decoder, rescales boxes by 1/scale and feeds
the native COCO-mAP evaluator.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.coco_eval import CocoMAPEvaluator


def make_loss_fn(model, criterion) -> Callable:

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
        loss_dict = criterion(outs, batch["annots"])
        total = jnp.zeros((), jnp.float32)
        for v in loss_dict.values():
            total = total + v
        return total, (dict(loss_dict), new_vars)

    return loss_fn


def evaluate_coco(model, params, state_vars, decoder, loader,
                  num_classes: int) -> dict:
    """Full COCO-style eval: forward (jit) -> on-device decode -> host mAP.

    Boxes are rescaled to original image coordinates by 1/scale
    (reference tools/scripts.py:742)."""

    @jax.jit
    def forward(p, sv, images):
        return model.apply({"params": p, **sv}, images, False)

    evaluator = CocoMAPEvaluator(num_classes)
    for batch in loader:
        outs = forward(params, state_vars, jnp.asarray(batch["image"]))
        try:
            scores, classes, boxes = decoder(outs)
        except TypeError:
            # DETR-family decoders denormalise cxcywh boxes by the scaled
            # (pre-padding) image sizes the collater records under 'size'
            scores, classes, boxes = decoder(outs, batch["size"])
        scales = np.asarray(batch["scale"])
        annots = np.asarray(batch["annots"])
        for i in range(scores.shape[0]):
            keep = scores[i] > -1
            det_boxes = boxes[i][keep] / max(scales[i], 1e-8)
            gt = annots[i]
            gt_valid = gt[:, 4] >= 0
            gt_boxes = gt[gt_valid, :4] / max(scales[i], 1e-8)
            evaluator.add_image(det_boxes, scores[i][keep],
                                classes[i][keep].astype(np.int32),
                                gt_boxes, gt[gt_valid, 4].astype(np.int32))
    stats = evaluator.compute()
    key = stats.get("IoU=0.5:0.95,area=all,maxDets=100,mAP", -1.0)
    stats["key_metric"] = key * 100.0
    return stats


def make_detr_loss_fn(model, criterion) -> Callable:
    """DETR/DINO-DETR variant: the model takes (image, mask-or-annotations)
    and the criterion consumes cxcywh-normalised 'scaled_annots'
    (reference tools/scripts.py:871-876)."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng, "dn": rng}

        def run(*args, **kw):
            if train and mutable:
                return model.apply(variables, *args, train, rngs=rngs,
                                   mutable=mutable, **kw)
            return model.apply(variables, *args, train, rngs=rngs, **kw), \
                state_vars

        if hasattr(model, "dn_number"):  # DINO-DETR signature
            outs, new_vars = run(batch["image"], batch["scaled_annots"])
        else:
            outs, new_vars = run(batch["image"], batch["mask"])
        loss_dict = criterion(outs, batch["scaled_annots"])
        total = jnp.zeros((), jnp.float32)
        for v in loss_dict.values():
            total = total + v
        return total, (dict(loss_dict), new_vars)

    return loss_fn
