"""Fixed-shape, on-device NMS.

The reference's NMS is a per-image numpy while-loop on the host
(simpleAICV/detection/decode.py:26-106) — a known bottleneck its eval loop pays
per image. Here NMS is a jittable O(K^2) masked iteration (identical keep set
to sequential greedy NMS) that runs batched on the TPU inside the decode jit,
with IoU or DIoU suppression ("python_nms" / "diou_python_nms" parity; the
"torch_nms" flavour is the same algorithm).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_iou(boxes):
    """[K,4] xyxy -> [K,K] IoU."""
    b1 = boxes[:, None, :]
    b2 = boxes[None, :, :]
    omin = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    omax = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    owh = jnp.clip(omax - omin, 0.0, None)
    overlap = owh[..., 0] * owh[..., 1]
    wh = jnp.clip(boxes[:, 2:4] - boxes[:, 0:2], 0.0, None)
    areas = wh[:, 0] * wh[:, 1]
    union = jnp.clip(areas[:, None] + areas[None, :] - overlap, 1e-4, None)
    return overlap / union


def _pairwise_diou(boxes):
    iou = _pairwise_iou(boxes)
    b1 = boxes[:, None, :]
    b2 = boxes[None, :, :]
    emin = jnp.minimum(b1[..., 0:2], b2[..., 0:2])
    emax = jnp.maximum(b1[..., 2:4], b2[..., 2:4])
    ewh = jnp.clip(emax - emin, 0.0, None)
    c2 = jnp.clip(ewh[..., 0]**2 + ewh[..., 1]**2, 1e-4, None)
    ctr = (boxes[:, 0:2] + boxes[:, 2:4]) / 2
    p2 = jnp.sum((ctr[:, None, :] - ctr[None, :, :])**2, axis=-1)
    return iou - p2 / c2


def nms_keep_mask(boxes, scores, iou_threshold: float = 0.5,
                  nms_type: str = "python_nms"):
    """Greedy NMS on score-descending candidates. Returns keep mask [K].

    ``boxes`` need NOT be pre-sorted; sorting happens inside. Suppressed =
    overlap metric >= threshold with a higher-scoring kept box (matches the
    reference's ``ious < threshold`` keep rule).
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]

    if nms_type == "diou_python_nms":
        overlap = _pairwise_diou(boxes_s)
    else:
        overlap = _pairwise_iou(boxes_s)

    suppress_mat = overlap >= iou_threshold
    idx = jnp.arange(k)

    def body(i, keep):
        # row i suppresses lower-ranked boxes only if i itself is kept
        row = jnp.where(keep[i], suppress_mat[i], False)
        return keep & ~(row & (idx > i))

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    # scatter back to original order
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("max_output", "iou_threshold", "nms_type"))
def batched_nms(boxes, scores, max_output: int = 100,
                iou_threshold: float = 0.5, nms_type: str = "python_nms"):
    """[B,K,4],[B,K] -> (scores [B,M], indices [B,M], valid [B,M]).

    Kept detections sorted by score; invalid slots have score -1/index -1.
    """

    def one_image(b, s):
        keep = nms_keep_mask(b, s, iou_threshold, nms_type)
        masked_scores = jnp.where(keep, s, -jnp.inf)
        k = min(max_output, masked_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(masked_scores, k)
        if k < max_output:
            pad = max_output - k
            top_scores = jnp.pad(top_scores, (0, pad),
                                 constant_values=-jnp.inf)
            top_idx = jnp.pad(top_idx, (0, pad), constant_values=0)
        valid = top_scores > -jnp.inf
        return (jnp.where(valid, top_scores, -1.0),
                jnp.where(valid, top_idx, -1), valid)

    return jax.vmap(one_image)(boxes, scores)
