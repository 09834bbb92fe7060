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
from ...ops.upsample import resize_bilinear

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
    """SOLOv2 decode, exactly the reference's sequence
    (instance_segmentation/decode.py:339-582) as ONE fixed-shape jitted
    program: per-level sigmoid + points-NMS -> ALL (grid-cell, class) score
    pairs above min_score_threshold (not per-cell argmax) -> dynamic-conv
    soft masks -> stride filter (sum(mask) > cell stride) -> maskness
    multiply -> score sort + topn -> gaussian Matrix NMS ->
    update/keep-score thresholds -> top max_object_num -> x4
    align_corners=True bilinear upsample of the SOFT masks -> threshold.

    Fixed-shape note: the reference materializes masks for the ragged "all
    pairs above threshold" set; here a candidate pool of the
    ``candidate_pool`` highest-scoring pairs stands in (default 2*topn —
    exact whenever at most that many pairs clear min_score_threshold, which
    trained heads satisfy by orders of magnitude)."""

    def __init__(self, strides=(8, 8, 16, 32, 32),
                 grid_nums=(40, 36, 24, 16, 12),
                 mask_feature_upsample_scale=4, mask_threshold=0.5,
                 min_score_threshold=0.1, keep_score_threshold=0.1,
                 update_threshold=0.05, nms_sigma=2.0, topn=500,
                 max_object_num=100, candidate_pool=None,
                 keep_instance_threshold=None):
        self.strides = strides
        self.grid_nums = grid_nums
        self.upsample = mask_feature_upsample_scale
        self.mask_threshold = mask_threshold
        self.min_score_threshold = min_score_threshold
        # legacy alias from the round-3 decoder
        self.update_threshold = (keep_instance_threshold
                                 if keep_instance_threshold is not None
                                 else update_threshold)
        self.keep_score_threshold = keep_score_threshold
        self.nms_sigma = nms_sigma
        self.topn = topn
        self.max_object_num = max_object_num
        self.candidate_pool = candidate_pool or 2 * topn

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

        all_cate, all_kernels, stride_list = [], [], []
        for level, g in enumerate(self.grid_nums):
            cate = jax.nn.sigmoid(cate_preds[level].astype(jnp.float32))
            cate = jax.vmap(_points_nms)(cate)
            all_cate.append(cate.reshape(b, g * g, num_classes))
            all_kernels.append(kernel_preds[level].reshape(b, g * g, -1))
            stride_list.append(
                jnp.full((g * g,), self.strides[level], jnp.float32))
        cate = jnp.concatenate(all_cate, axis=1)           # [B,P,C]
        kernels = jnp.concatenate(all_kernels, axis=1)     # [B,P,K]
        cell_strides = jnp.concatenate(stride_list)        # [P]

        # ALL (cell, class) pairs above threshold (reference :404-420)
        p = cate.shape[1]
        pair_scores = cate.reshape(b, p * num_classes)
        pair_scores = jnp.where(pair_scores > self.min_score_threshold,
                                pair_scores, -1.0)
        pool = min(self.candidate_pool, p * num_classes)
        cand_scores, cand_idx = jax.lax.top_k(pair_scores, pool)
        cand_pos = cand_idx // num_classes
        cand_labels = cand_idx % num_classes
        cand_kernels = jnp.take_along_axis(kernels, cand_pos[..., None],
                                           axis=1)
        cand_strides = cell_strides[cand_pos]
        valid = cand_scores > 0

        # dynamic-conv soft masks (reference F.conv2d 1x1, :438-445)
        soft = jax.nn.sigmoid(jnp.einsum(
            "bkc,bhwc->bkhw", cand_kernels, mask_feat.astype(jnp.float32),
            preferred_element_type=jnp.float32))
        binary = soft > self.mask_threshold
        mask_sum = jnp.sum(binary, axis=(2, 3)).astype(jnp.float32)

        # stride filter (reference :448-452: sum_masks > strides)
        valid = valid & (mask_sum > cand_strides)

        # maskness BEFORE topn (reference :463-467)
        maskness = jnp.sum(soft * binary, axis=(2, 3)) / \
            jnp.clip(mask_sum, 1e-6, None)
        scores2 = jnp.where(valid, cand_scores * maskness, -1.0)

        k = min(self.topn, pool)
        top_scores, top_i = jax.lax.top_k(scores2, k)
        top_labels = jnp.take_along_axis(cand_labels, top_i, axis=1)
        top_soft = jnp.take_along_axis(soft, top_i[:, :, None, None], axis=1)
        top_binary = jnp.take_along_axis(
            binary, top_i[:, :, None, None], axis=1)

        keep_thr = max(self.update_threshold, self.keep_score_threshold)

        def per_image(bin_masks, soft_masks, lab, sc):
            updated = matrix_nms(bin_masks, lab, sc, self.nms_sigma)
            updated = jnp.where((updated >= keep_thr) & (sc > 0),
                                updated, -1.0)
            out_s, out_i = jax.lax.top_k(updated, self.max_object_num)
            ok = out_s > 0
            out_l = jnp.where(ok, lab[out_i], -1)
            # reference upsamples the SOFT masks x4 with align_corners=True
            # and re-thresholds (:532-556)
            up = resize_bilinear(
                soft_masks[out_i],
                (soft_masks.shape[1] * self.upsample,
                 soft_masks.shape[2] * self.upsample),
                spatial_axes=(1, 2), align_corners=True)
            out_m = jnp.where(ok[:, None, None],
                              up > self.mask_threshold, False)
            return out_m, out_l, jnp.where(ok, out_s, -1.0)

        return jax.vmap(per_image)(top_binary, top_soft, top_labels,
                                   top_scores)


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
