"""DETR decoder (parity: reference simpleAICV/detection/decode.py:367-486 —
last-layer softmax, drop the no-object class, cxcywh*scaled-size boxes,
score threshold, optional NMS off by default)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry import DECODERS

__all__ = ["DETRDecoder"]


@DECODERS.register()
class DETRDecoder:

    def __init__(self, num_classes=80, max_object_num=100,
                 min_score_threshold=0.05, **kwargs):
        self.num_classes = num_classes
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold

    def __call__(self, preds, scaled_sizes):
        cls_preds = jnp.asarray(preds[0][-1])
        reg_preds = jnp.asarray(preds[1][-1])
        probs = jax.nn.softmax(cls_preds.astype(jnp.float32), -1)
        scores = jnp.max(probs, -1)
        classes = jnp.argmax(probs, -1)

        boxes = jnp.concatenate([reg_preds[..., :2] - reg_preds[..., 2:] / 2,
                                 reg_preds[..., :2] + reg_preds[..., 2:] / 2],
                                -1)
        sizes = jnp.asarray(scaled_sizes, jnp.float32)  # [B,2] (h,w)
        scale = jnp.stack([sizes[:, 1], sizes[:, 0], sizes[:, 1],
                           sizes[:, 0]], -1)[:, None, :]
        boxes = boxes * scale

        valid = (classes < self.num_classes) & \
            (scores > self.min_score_threshold)
        masked = jnp.where(valid, scores, -jnp.inf)
        k = min(self.max_object_num, scores.shape[1])
        top_s, top_i = jax.lax.top_k(masked, k)
        out_valid = top_s > -jnp.inf
        out_scores = jnp.where(out_valid, top_s, -1.0)
        out_classes = jnp.where(
            out_valid, jnp.take_along_axis(classes, top_i, 1), -1)
        out_boxes = jnp.where(out_valid[..., None],
                              jnp.take_along_axis(boxes, top_i[..., None], 1),
                              0.0)
        # reference always pads to max_object_num (decode.py:419-424),
        # even with fewer queries than that
        pad = self.max_object_num - k
        if pad > 0:
            b = out_scores.shape[0]
            out_scores = jnp.concatenate(
                [out_scores, jnp.full((b, pad), -1.0)], 1)
            out_classes = jnp.concatenate(
                [out_classes, jnp.full((b, pad), -1, out_classes.dtype)], 1)
            out_boxes = jnp.concatenate(
                [out_boxes, jnp.zeros((b, pad, 4))], 1)
        return [np.asarray(out_scores),
                np.asarray(out_classes, np.float32),
                np.asarray(out_boxes)]
