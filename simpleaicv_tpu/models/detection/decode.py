"""On-device detection decoders (parity: reference
simpleAICV/detection/decode.py:26-366 — DetNMSMethod/DecodeMethod/
RetinaDecoder/FCOSDecoder), redesigned jit-first.

The reference decodes per image on the host with numpy while-loop NMS; here
the whole batch decode (box snap, score/class select, top-n, NMS, final top-k
padding to ``max_object_num`` with −1 fill) is ONE jitted fixed-shape program
that runs on the TPU. Output contract matches the reference exactly:
[batch_scores [B,M], batch_classes [B,M], batch_bboxes [B,M,4]] with −1/0
padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry import DECODERS
from ...ops.nms import nms_keep_mask
from .anchor import FCOSPositions, RetinaAnchors

__all__ = ["RetinaDecoder", "FCOSDecoder"]


@partial(jax.jit, static_argnames=("max_object_num", "min_score_threshold",
                                   "topn", "nms_type", "nms_threshold"))
def _decode_batch(cls_scores, cls_classes, pred_bboxes, max_object_num,
                  min_score_threshold, topn, nms_type, nms_threshold):
    """cls_scores/classes [B,N], pred_bboxes [B,N,4] -> reference output
    triple, fully on device."""

    def one_image(scores, classes, boxes):
        valid = scores > min_score_threshold
        masked = jnp.where(valid, scores, -jnp.inf)
        k = min(topn, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_boxes = boxes[top_idx]
        top_classes = classes[top_idx]
        top_valid = top_scores > -jnp.inf
        # push invalid candidates far away so they never suppress anyone
        nms_boxes = jnp.where(top_valid[:, None], top_boxes,
                              -1e8 * jnp.ones_like(top_boxes))
        keep = nms_keep_mask(nms_boxes, jnp.where(top_valid, top_scores, -1e9),
                             nms_threshold, nms_type)
        keep = keep & top_valid
        final_scores = jnp.where(keep, top_scores, -jnp.inf)
        out_scores, out_idx = jax.lax.top_k(final_scores, max_object_num)
        out_valid = out_scores > -jnp.inf
        out_classes = jnp.where(out_valid, top_classes[out_idx], -1.0)
        out_boxes = jnp.where(out_valid[:, None], top_boxes[out_idx], 0.0)
        out_scores = jnp.where(out_valid, out_scores, -1.0)
        return out_scores, out_classes, out_boxes

    return jax.vmap(one_image)(cls_scores, cls_classes.astype(jnp.float32),
                               pred_bboxes)


class _DecoderBase:

    def __init__(self, max_object_num=100, min_score_threshold=0.05,
                 topn=1000, nms_type="python_nms", nms_threshold=0.5):
        assert nms_type in ("torch_nms", "python_nms", "diou_python_nms")
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn
        self.nms_type = "python_nms" if nms_type == "torch_nms" else nms_type
        self.nms_threshold = nms_threshold

    def _decode(self, cls_scores, cls_classes, pred_bboxes):
        scores, classes, boxes = _decode_batch(
            cls_scores, cls_classes, pred_bboxes,
            max_object_num=self.max_object_num,
            min_score_threshold=self.min_score_threshold, topn=self.topn,
            nms_type=self.nms_type, nms_threshold=self.nms_threshold)
        return [np.asarray(scores), np.asarray(classes), np.asarray(boxes)]


@DECODERS.register()
class RetinaDecoder(_DecoderBase):

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256), (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128), **kwargs):
        super().__init__(**kwargs)
        self.anchors = RetinaAnchors(areas, ratios, scales, strides)

    def __call__(self, preds):
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = cls_preds[0].shape[0]
        c = cls_preds[0].shape[-1]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, c) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds], axis=1)

        cls_classes = jnp.argmax(cls_preds, axis=2)
        cls_scores = jnp.max(cls_preds, axis=2)

        awh = anchors[None, :, 2:4] - anchors[None, :, 0:2]
        actr = anchors[None, :, 0:2] + 0.5 * awh
        wh = jnp.exp(reg_preds[..., 2:4].astype(jnp.float32)) * awh
        ctr = reg_preds[..., 0:2].astype(jnp.float32) * awh + actr
        boxes = jnp.concatenate([ctr - 0.5 * wh, ctr + 0.5 * wh], axis=2)
        # reference casts to int32 (decode.py:271) == truncation toward zero
        boxes = jnp.trunc(boxes)
        return self._decode(cls_scores, cls_classes, boxes)


@DECODERS.register()
class FCOSDecoder(_DecoderBase):

    def __init__(self, strides=(8, 16, 32, 64, 128), **kwargs):
        kwargs.setdefault("nms_threshold", 0.6)
        super().__init__(**kwargs)
        self.positions = FCOSPositions(strides)

    def __call__(self, preds):
        cls_preds, reg_preds, center_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        pos, _ = self.positions.flat_positions_strides(feature_sizes)
        pos = jnp.asarray(pos)

        b = cls_preds[0].shape[0]
        c = cls_preds[0].shape[-1]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, c) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds], axis=1)
        center_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 1) for p in center_preds], axis=1)

        cls_classes = jnp.argmax(cls_preds, axis=2)
        cls_scores = jnp.max(cls_preds, axis=2)
        cls_scores = jnp.sqrt(cls_scores * center_preds[..., 0])

        exp_reg = jnp.exp(reg_preds.astype(jnp.float32))
        boxes = jnp.concatenate([pos[None] - exp_reg[..., 0:2],
                                 pos[None] + exp_reg[..., 2:4]], axis=2)
        boxes = jnp.trunc(boxes)  # reference astype(np.int32) (decode.py:364)
        return self._decode(cls_scores, cls_classes, boxes)
