"""DINO-DETR decoder (parity: reference
simpleAICV/detection/decode.py:486-713 — per-query sigmoid max/argmax class
select, score threshold, descending sort + topn, class-agnostic python NMS,
top max_object_num, cxcywh * scaled-size boxes). One jitted fixed-shape
program; the reference decodes per image with numpy."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry import DECODERS
from ...ops.nms import nms_keep_mask

__all__ = ["DINODETRDecoder"]


@DECODERS.register()
class DINODETRDecoder:

    def __init__(self, num_classes=80, max_object_num=100,
                 min_score_threshold=0.05, topn=300,
                 nms_type="python_nms", nms_threshold=0.5, **kwargs):
        self.num_classes = num_classes
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn
        self.nms_type = ("python_nms" if nms_type == "torch_nms"
                         else nms_type)
        self.nms_threshold = nms_threshold

    def __call__(self, preds, scaled_sizes):
        cls_preds = jnp.asarray(preds["pred_logits"])
        reg_preds = jnp.asarray(preds["pred_boxes"])
        probs = jax.nn.sigmoid(cls_preds.astype(jnp.float32))
        scores = jnp.max(probs, -1)                 # reference :517-527
        classes = jnp.argmax(probs, -1)

        boxes = jnp.concatenate([reg_preds[..., :2] - reg_preds[..., 2:] / 2,
                                 reg_preds[..., :2] + reg_preds[..., 2:] / 2],
                                -1).astype(jnp.float32)
        sizes = jnp.asarray(scaled_sizes, jnp.float32)  # [B,2] (h,w)
        scale = jnp.stack([sizes[:, 1], sizes[:, 0], sizes[:, 1],
                           sizes[:, 0]], -1)[:, None, :]
        boxes = boxes * scale

        def one_image(sc, cl, bx):
            masked = jnp.where(sc > self.min_score_threshold, sc, -jnp.inf)
            k = min(self.topn, sc.shape[0])
            top_s, top_i = jax.lax.top_k(masked, k)
            top_valid = top_s > -jnp.inf
            top_b = bx[top_i]
            nms_boxes = jnp.where(top_valid[:, None], top_b,
                                  -1e8 * jnp.ones_like(top_b))
            if self.nms_type:                        # reference :456-460
                keep = nms_keep_mask(
                    nms_boxes, jnp.where(top_valid, top_s, -1e9),
                    self.nms_threshold, self.nms_type) & top_valid
            else:
                keep = top_valid
            final = jnp.where(keep, top_s, -jnp.inf)
            out_s, out_i = jax.lax.top_k(final, self.max_object_num)
            ok = out_s > -jnp.inf
            return (jnp.where(ok, out_s, -1.0),
                    jnp.where(ok, cl[top_i][out_i], -1).astype(jnp.float32),
                    jnp.where(ok[:, None], top_b[out_i], 0.0))

        out = jax.vmap(one_image)(scores, classes, boxes)
        return [np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[2])]
