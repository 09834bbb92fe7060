"""SOLOv2 decoder with Matrix NMS (parity: reference
simpleAICV/instance_segmentation/decode.py:339-650 — points-NMS on the
category heatmaps, dynamic-conv mask generation, gaussian Matrix-NMS score
decay, top-k output). Fully jittable fixed-shape pipeline."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry import DECODERS

__all__ = ["SOLOV2Decoder", "YOLACTDecoder", "matrix_nms"]


def matrix_nms(seg_masks, cate_labels, cate_scores, sigma: float = 2.0):
    """Gaussian Matrix NMS (reference decode.py:582-650). [N,h,w] binary
    masks, score-descending order. Returns updated scores [N]."""
    n = seg_masks.shape[0]
    flat = seg_masks.reshape(n, -1).astype(jnp.float32)
    sum_masks = jnp.sum(flat, axis=1)
    inter = flat @ flat.T
    union = sum_masks[:, None] + sum_masks[None, :] - inter
    iou = inter / jnp.clip(union, 1e-6, None)
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    iou = jnp.where(triu, iou, 0.0)
    label_match = jnp.where(triu, cate_labels[:, None] == cate_labels[None, :],
                            False).astype(jnp.float32)
    decay_iou = iou * label_match
    compensate = jnp.max(decay_iou, axis=0)          # per column
    compensate = compensate[:, None]                 # [N,1] broadcast rows
    decay = jnp.exp(-sigma * decay_iou**2)
    comp = jnp.exp(-sigma * compensate**2)
    coeff = jnp.min(decay / comp, axis=0)
    return cate_scores * coeff


def _points_nms(heatmap):
    """2x2 max-pool local-peak suppression (reference :564-571).
    heatmap [g,g,C]."""
    padded = jnp.pad(heatmap, ((1, 0), (1, 0), (0, 0)), constant_values=-1e9)
    pooled = jax.lax.reduce_window(padded, -jnp.inf, jax.lax.max,
                                   (2, 2, 1), (1, 1, 1), "VALID")
    keep = (pooled == heatmap).astype(heatmap.dtype)
    return heatmap * keep


@DECODERS.register()
class SOLOV2Decoder:

    def __init__(self, strides=(8, 8, 16, 32, 32),
                 grid_nums=(40, 36, 24, 16, 12), mask_threshold=0.5,
                 min_score_threshold=0.1, keep_instance_threshold=0.05,
                 nms_sigma=2.0, topn=500, max_object_num=100):
        self.grid_nums = grid_nums
        self.mask_threshold = mask_threshold
        self.min_score_threshold = min_score_threshold
        self.keep_instance_threshold = keep_instance_threshold
        self.nms_sigma = nms_sigma
        self.topn = topn
        self.max_object_num = max_object_num

    def __call__(self, preds):
        """preds: (mask_feat [B,h,w,C], kernel_preds, cate_preds).
        Returns (batch_masks [B,K,4h,4w] bool, batch_labels [B,K],
        batch_scores [B,K]) with −1 padding, as numpy."""
        mask_feat, kernel_preds, cate_preds = preds
        masks, labels, scores = self._decode_jit(
            jnp.asarray(mask_feat),
            tuple(jnp.asarray(k) for k in kernel_preds),
            tuple(jnp.asarray(c) for c in cate_preds))
        return (np.asarray(masks), np.asarray(labels), np.asarray(scores))

    @partial(jax.jit, static_argnums=(0,))
    def _decode_jit(self, mask_feat, kernel_preds, cate_preds):
        b = mask_feat.shape[0]
        num_classes = cate_preds[0].shape[-1]

        all_scores, all_labels, all_kernels = [], [], []
        for level, g in enumerate(self.grid_nums):
            cate = jax.nn.sigmoid(cate_preds[level].astype(jnp.float32))
            cate = jax.vmap(_points_nms)(cate)
            cate = cate.reshape(b, g * g, num_classes)
            lvl_scores = jnp.max(cate, axis=-1)
            lvl_labels = jnp.argmax(cate, axis=-1)
            all_scores.append(lvl_scores)
            all_labels.append(lvl_labels)
            all_kernels.append(kernel_preds[level].reshape(
                b, g * g, -1))
        scores = jnp.concatenate(all_scores, axis=1)
        labels = jnp.concatenate(all_labels, axis=1)
        kernels = jnp.concatenate(all_kernels, axis=1)

        scores = jnp.where(scores > self.min_score_threshold, scores, -1.0)
        k = min(self.topn, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        top_labels = jnp.take_along_axis(labels, top_idx, axis=1)
        top_kernels = jnp.take_along_axis(
            kernels, top_idx[..., None], axis=1)

        pred_masks = jnp.einsum("bkc,bhwc->bkhw", top_kernels,
                                mask_feat.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        pred_masks = jax.nn.sigmoid(pred_masks)
        binary = pred_masks > self.mask_threshold
        mask_sum = jnp.sum(binary, axis=(2, 3)).astype(jnp.float32)
        mask_scores = jnp.sum(pred_masks * binary, axis=(2, 3)) / \
            jnp.clip(mask_sum, 1e-6, None)
        final_scores = jnp.where((top_scores > 0) & (mask_sum > 0),
                                 top_scores * mask_scores, 0.0)

        def per_image(bin_masks, lab, sc):
            updated = matrix_nms(bin_masks, lab, sc, self.nms_sigma)
            updated = jnp.where(updated > self.keep_instance_threshold,
                                updated, -1.0)
            out_s, out_i = jax.lax.top_k(updated, self.max_object_num)
            out_l = jnp.where(out_s > 0, lab[out_i], -1)
            out_m = jnp.where((out_s > 0)[:, None, None], bin_masks[out_i],
                              False)
            return out_m, out_l, out_s

        return jax.vmap(per_image)(binary, top_labels, final_scores)


@DECODERS.register()
class YOLACTDecoder:
    """YOLACT decode (parity: reference instance_segmentation/decode.py:
    22-336 — softmax class scores minus background, SSD-style box decode
    with 0.1/0.2 variances from relative cxcywh anchors, fast NMS
    [per-class top-n, upper-triangular IoU-max <= thr, then global top
    max_object_num], mask = sigmoid(proto @ coef) cropped to the box).
    Fixed-shape jitted pipeline: returns (masks [B,K,Hp,Wp] bool at proto
    resolution, labels [B,K], scores [B,K]) with −1 padding."""

    def __init__(self, resize=544, resize_type="yolo_style",
                 scales=(24, 48, 96, 192, 384), ratios=(1, 0.5, 2),
                 strides=(8, 16, 32, 64, 128), topn=200, max_object_num=100,
                 min_score_threshold=0.05, nms_threshold=0.5):
        from .yolact import YOLACTAnchors
        if resize_type == "retina_style":
            resize = int(round(resize * 1333.0 / 800))
        self.anchors = YOLACTAnchors(resize=resize, scales=scales,
                                     ratios=ratios, strides=strides)
        self.topn = topn
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.nms_threshold = nms_threshold

    def __call__(self, preds):
        class_preds, box_preds, coef_preds, proto_out = preds[:4]
        sizes = [[c.shape[2], c.shape[1]] for c in class_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(sizes))
        b = proto_out.shape[0]
        cls_flat = jnp.concatenate(
            [c.reshape(b, -1, c.shape[-1]) for c in class_preds], axis=1)
        box_flat = jnp.concatenate(
            [x.reshape(b, -1, 4) for x in box_preds], axis=1)
        coef_flat = jnp.concatenate(
            [x.reshape(b, -1, x.shape[-1]) for x in coef_preds], axis=1)
        masks, labels, scores = self._decode_jit(
            cls_flat, box_flat, coef_flat, jnp.asarray(proto_out), anchors)
        return np.asarray(masks), np.asarray(labels), np.asarray(scores)

    @partial(jax.jit, static_argnums=(0,))
    def _decode_jit(self, cls_flat, box_flat, coef_flat, proto, anchors):

        def one(cls_p, box_p, coef_p, pr):
            probs = jax.nn.softmax(cls_p.astype(jnp.float32), -1)[:, 1:]
            nc = probs.shape[1]
            # SSD-style decode (reference :146-157)
            ctr = anchors[:, :2] + box_p[:, :2] * 0.1 * anchors[:, 2:]
            wh = anchors[:, 2:] * jnp.exp(box_p[:, 2:] * 0.2)
            boxes = jnp.clip(jnp.concatenate(
                [ctr - wh / 2, ctr + wh / 2], axis=1), 0.0, 1.0)

            # fast NMS: per-class top-n
            k = min(self.topn, probs.shape[0])
            scores_c, idx_c = jax.lax.top_k(probs.T, k)       # [C,k]
            boxes_c = boxes[idx_c]                            # [C,k,4]
            coefs_c = coef_p[idx_c]                           # [C,k,P]
            lt = jnp.maximum(boxes_c[:, :, None, :2],
                             boxes_c[:, None, :, :2])
            rb = jnp.minimum(boxes_c[:, :, None, 2:],
                             boxes_c[:, None, :, 2:])
            whi = jnp.clip(rb - lt, 0, None)
            inter = whi[..., 0] * whi[..., 1]
            area = jnp.clip(boxes_c[..., 2] - boxes_c[..., 0], 0, None) * \
                jnp.clip(boxes_c[..., 3] - boxes_c[..., 1], 0, None)
            union = jnp.clip(area[:, :, None] + area[:, None, :] - inter,
                             1e-9, None)
            iou = inter / union                               # [C,k,k]
            triu = jnp.triu(jnp.ones((k, k), bool), 1)[None]
            iou_max = jnp.max(jnp.where(triu, iou, 0.0), axis=1)  # [C,k]
            keep = (iou_max <= self.nms_threshold) & \
                (scores_c > self.min_score_threshold)
            flat_scores = jnp.where(keep, scores_c, -1.0).reshape(-1)
            flat_labels = jnp.broadcast_to(
                jnp.arange(nc)[:, None], (nc, k)).reshape(-1)
            m = self.max_object_num
            top_scores, top_idx = jax.lax.top_k(flat_scores, m)
            top_labels = jnp.where(top_scores > 0,
                                   flat_labels[top_idx], -1)
            top_boxes = boxes_c.reshape(-1, 4)[top_idx]
            top_coefs = coefs_c.reshape(-1, coefs_c.shape[-1])[top_idx]

            # masks at proto resolution, cropped to the (padded) box
            mk = jax.nn.sigmoid(
                jnp.einsum("hwp,kp->khw", pr.astype(jnp.float32), top_coefs))
            hp, wp = mk.shape[1:]
            xs = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
            ys = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
            x1 = top_boxes[:, 0, None, None] * wp - 1
            x2 = top_boxes[:, 2, None, None] * wp + 1
            y1 = top_boxes[:, 1, None, None] * hp - 1
            y2 = top_boxes[:, 3, None, None] * hp + 1
            inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
            mk = (mk * inside) > 0.5
            mk = mk & (top_scores[:, None, None] > 0)
            return mk, top_labels, jnp.where(top_scores > 0,
                                             top_scores, -1.0)

        return jax.vmap(one)(cls_flat, box_flat, coef_flat, proto)
