"""DINO-DETR decoder (parity: reference
simpleAICV/detection/decode.py:486-763 — sigmoid scores flattened over
queries x classes, global top-k selection, cxcywh*scaled-size boxes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry import DECODERS

__all__ = ["DINODETRDecoder"]


@DECODERS.register()
class DINODETRDecoder:

    def __init__(self, num_classes=80, max_object_num=100,
                 min_score_threshold=0.05, topn=300, **kwargs):
        self.num_classes = num_classes
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn

    def __call__(self, preds, scaled_sizes):
        cls_preds = jnp.asarray(preds["pred_logits"])
        reg_preds = jnp.asarray(preds["pred_boxes"])
        b, q, c = cls_preds.shape
        probs = jax.nn.sigmoid(cls_preds.astype(jnp.float32)).reshape(b,
                                                                      q * c)
        k = min(self.max_object_num, q * c)
        top_s, top_i = jax.lax.top_k(probs, k)
        query_idx = top_i // c
        classes = top_i % c

        boxes = jnp.concatenate([reg_preds[..., :2] - reg_preds[..., 2:] / 2,
                                 reg_preds[..., :2] + reg_preds[..., 2:] / 2],
                                -1)
        boxes = jnp.take_along_axis(boxes, query_idx[..., None], 1)
        sizes = jnp.asarray(scaled_sizes, jnp.float32)
        scale = jnp.stack([sizes[:, 1], sizes[:, 0], sizes[:, 1],
                           sizes[:, 0]], -1)[:, None, :]
        boxes = boxes * scale

        valid = top_s > self.min_score_threshold
        return [np.asarray(jnp.where(valid, top_s, -1.0)),
                np.asarray(jnp.where(valid, classes, -1), np.float32),
                np.asarray(jnp.where(valid[..., None], boxes, 0.0))]
