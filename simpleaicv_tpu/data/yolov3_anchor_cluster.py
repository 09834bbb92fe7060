"""YOLOv3 anchor k-means clustering (parity: reference
simpleAICV/detection/yolov3_anchor_cluster.py — IoU-distance k-means over
dataset box shapes)."""

from __future__ import annotations

import numpy as np


def iou_wh(wh, anchors):
    """[N,2] vs [K,2] -> [N,K] IoU assuming co-centered boxes."""
    inter = np.minimum(wh[:, None, 0], anchors[None, :, 0]) * \
        np.minimum(wh[:, None, 1], anchors[None, :, 1])
    union = wh[:, 0:1] * wh[:, 1:2] + \
        (anchors[:, 0] * anchors[:, 1])[None] - inter
    return inter / np.clip(union, 1e-10, None)


def kmeans_anchors(boxes_wh: np.ndarray, k: int = 9, iters: int = 300,
                   seed: int = 0):
    """Returns (anchors [k,2] sorted by area, mean best-IoU)."""
    rng = np.random.RandomState(seed)
    wh = np.asarray(boxes_wh, np.float64)
    anchors = wh[rng.choice(len(wh), k, replace=False)]
    last = None
    for _ in range(iters):
        d = 1.0 - iou_wh(wh, anchors)
        assign = d.argmin(1)
        if last is not None and (assign == last).all():
            break
        for i in range(k):
            sel = wh[assign == i]
            if len(sel):
                anchors[i] = np.median(sel, axis=0)
        last = assign
    order = np.argsort(anchors[:, 0] * anchors[:, 1])
    anchors = anchors[order]
    best = iou_wh(wh, anchors).max(1).mean()
    return anchors, float(best)
