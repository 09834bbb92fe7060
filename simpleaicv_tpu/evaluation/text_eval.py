"""OCR text-detection polygon P/R/F1 (parity: reference
tools/text_scripts.py:1186-1674 — one-to-one polygon matching by IoU over
rasterised polygons, precision/recall/F1 at IoU 0.5). Uses cv2 rasterisation
instead of shapely (not in this environment)."""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np


def _poly_iou(p1, p2, hw=None):
    pts = np.concatenate([p1.reshape(-1, 2), p2.reshape(-1, 2)], 0)
    w = int(pts[:, 0].max()) + 2
    h = int(pts[:, 1].max()) + 2
    m1 = np.zeros((h, w), np.uint8)
    m2 = np.zeros((h, w), np.uint8)
    cv2.fillPoly(m1, [p1.astype(np.int32).reshape(-1, 2)], 1)
    cv2.fillPoly(m2, [p2.astype(np.int32).reshape(-1, 2)], 1)
    inter = np.logical_and(m1, m2).sum()
    union = np.logical_or(m1, m2).sum()
    return inter / max(union, 1)


def evaluate_text_detection(per_image_results: Sequence[dict],
                            iou_threshold: float = 0.5) -> dict:
    """per_image_results: dicts with 'pred_polys' (list of [N,2]),
    'gt_polys', 'gt_ignore' (bools)."""
    n_match = n_pred = n_gt = 0
    for r in per_image_results:
        preds: List[np.ndarray] = list(r["pred_polys"])
        gts = list(r["gt_polys"])
        ignore = list(r.get("gt_ignore", [False] * len(gts)))
        gt_used = [False] * len(gts)
        for p in preds:
            best_iou, best_g = iou_threshold, -1
            for g, (gt, ig) in enumerate(zip(gts, ignore)):
                if gt_used[g]:
                    continue
                iou = _poly_iou(np.asarray(p), np.asarray(gt))
                if iou >= best_iou:
                    best_iou, best_g = iou, g
            if best_g >= 0:
                gt_used[best_g] = True
                if not ignore[best_g]:
                    n_match += 1
            # predictions matching ignored gts don't count as FP
            if best_g >= 0 and ignore[best_g]:
                continue
            n_pred += 1
        n_gt += sum(1 for ig in ignore if not ig)
    precision = n_match / max(n_pred, 1) * 100
    recall = n_match / max(n_gt, 1) * 100
    f1 = 2 * precision * recall / max(precision + recall, 1e-4)
    return {"precision": precision, "recall": recall, "f1": f1,
            "key_metric": f1}


def evaluate_widerface_style(per_subset_results: dict,
                             iou_threshold: float = 0.5) -> dict:
    """WiderFace-style easy/medium/hard AP (parity: reference
    tools/face_detection_scripts.py:16-393 + widerface_evaluate): VOC-style
    AP at IoU 0.5 per difficulty subset."""
    from ..data.datasets.voc import evaluate_voc_detection
    out = {}
    for subset, results in per_subset_results.items():
        stats = evaluate_voc_detection(results, num_classes=1,
                                       iou_threshold=iou_threshold)
        out[f"{subset}_ap"] = stats["mAP"] / 100.0
    out["key_metric"] = float(np.mean(list(out.values())))
    return out
