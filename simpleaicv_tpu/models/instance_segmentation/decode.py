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

__all__ = ["SOLOV2Decoder", "matrix_nms"]


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
