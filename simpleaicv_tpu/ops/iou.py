"""IoU family (IoU/GIoU/DIoU/CIoU/EIoU) — parity: reference
simpleAICV/detection/losses.py:28-126 (IoUMethod). Pure jnp, broadcasting over
arbitrary leading dims, f32."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def iou_method(boxes1, boxes2, iou_type: str = "IoU", box_type: str = "xyxy"):
    assert iou_type in ("IoU", "GIoU", "DIoU", "CIoU", "EIoU")
    assert box_type in ("xyxy", "xywh")
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)

    if box_type == "xywh":
        boxes1 = jnp.concatenate([boxes1[..., :2] - boxes1[..., 2:4] / 2,
                                  boxes1[..., :2] + boxes1[..., 2:4] / 2], -1)
        boxes2 = jnp.concatenate([boxes2[..., :2] - boxes2[..., 2:4] / 2,
                                  boxes2[..., :2] + boxes2[..., 2:4] / 2], -1)

    overlap_min = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
    overlap_max = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    overlap_wh = jnp.clip(overlap_max - overlap_min, 0.0, None)
    overlap = overlap_wh[..., 0] * overlap_wh[..., 1]

    wh1 = jnp.clip(boxes1[..., 2:4] - boxes1[..., 0:2], 0.0, None)
    wh2 = jnp.clip(boxes2[..., 2:4] - boxes2[..., 0:2], 0.0, None)
    area1 = wh1[..., 0] * wh1[..., 1]
    area2 = wh2[..., 0] * wh2[..., 1]
    union = jnp.clip(area1 + area2 - overlap, 1e-4, None)
    ious = overlap / union

    if iou_type == "IoU":
        return ious

    enc_min = jnp.minimum(boxes1[..., 0:2], boxes2[..., 0:2])
    enc_max = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    enc_wh = jnp.clip(enc_max - enc_min, 0.0, None)

    if iou_type == "GIoU":
        enc_area = jnp.clip(enc_wh[..., 0] * enc_wh[..., 1], 1e-4, None)
        return ious - (enc_area - union) / enc_area

    c2 = jnp.clip(enc_wh[..., 0]**2 + enc_wh[..., 1]**2, 1e-4, None)
    ctr1 = (boxes1[..., 2:4] + boxes1[..., 0:2]) / 2
    ctr2 = (boxes2[..., 2:4] + boxes2[..., 0:2]) / 2
    p2 = (ctr1[..., 0] - ctr2[..., 0])**2 + (ctr1[..., 1] - ctr2[..., 1])**2

    if iou_type == "DIoU":
        return ious - p2 / c2
    if iou_type == "CIoU":
        v = (4.0 / math.pi**2) * (
            jnp.arctan(wh2[..., 0] / jnp.clip(wh2[..., 1], 1e-4, None)) -
            jnp.arctan(wh1[..., 0] / jnp.clip(wh1[..., 1], 1e-4, None)))**2
        alpha = jax.lax.stop_gradient(
            v / jnp.clip(1.0 - ious + v, 1e-4, None))
        return ious - (p2 / c2 + v * alpha)
    # EIoU
    pw2 = (wh2[..., 0] - wh1[..., 0])**2
    ph2 = (wh2[..., 1] - wh1[..., 1])**2
    cw2 = jnp.clip(enc_wh[..., 0]**2, 1e-4, None)
    ch2 = jnp.clip(enc_wh[..., 1]**2, 1e-4, None)
    return ious - (p2 / c2 + pw2 / cw2 + ph2 / ch2)
