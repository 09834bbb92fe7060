"""Self-contained COCO-style detection mAP (pycocotools is not available in
this environment; this reimplements COCOeval 'bbox' semantics: 10 IoU
thresholds .5:.95, 101-point interpolated PR, area ranges all/small/medium/
large, maxDets 100 — reference eval path tools/scripts.py:694-836).

Inputs are plain numpy: per-image detections (boxes xyxy, scores, classes) and
ground truths (boxes xyxy, classes). Returns the standard 12-stat dict.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _box_iou(a, b):
    """[N,4],[M,4] xyxy -> [N,M]."""
    if a.shape[0] == 0 or b.shape[0] == 0:
        return np.zeros((a.shape[0], b.shape[0]), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    union = np.clip(area_a[:, None] + area_b[None, :] - inter, 1e-9, None)
    return inter / union


class CocoMAPEvaluator:
    """Accumulate per-image (dets, gts); compute() returns the 12 COCO stats."""

    def __init__(self, num_classes: int, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        # per class: list of (scores, tp[T, D], n_gt per area)
        self._images: List[dict] = []

    def add_image(self, det_boxes, det_scores, det_classes, gt_boxes,
                  gt_classes):
        self._images.append(dict(
            det_boxes=np.asarray(det_boxes, np.float32),
            det_scores=np.asarray(det_scores, np.float32),
            det_classes=np.asarray(det_classes, np.int32),
            gt_boxes=np.asarray(gt_boxes, np.float32),
            gt_classes=np.asarray(gt_classes, np.int32),
        ))

    def _match_one(self, dets, det_scores, gts, area_rng):
        """Greedy matching per COCOeval. Returns (tp [T,D], gt_ignore count,
        det_ignore [T,D])."""
        T = len(IOU_THRS)
        gt_area = np.clip(gts[:, 2] - gts[:, 0], 0, None) * np.clip(
            gts[:, 3] - gts[:, 1], 0, None)
        gt_ignore = (gt_area < area_rng[0]) | (gt_area > area_rng[1])
        # sort gts: non-ignored first (COCOeval sorts by ignore flag)
        gt_order = np.argsort(gt_ignore, kind="stable")
        gts = gts[gt_order]
        gt_ignore = gt_ignore[gt_order]

        order = np.argsort(-det_scores, kind="stable")[:self.max_dets]
        dets = dets[order]
        D, G = dets.shape[0], gts.shape[0]
        ious = _box_iou(dets, gts)

        tp = np.zeros((T, D), bool)
        det_ig = np.zeros((T, D), bool)
        for t, thr in enumerate(IOU_THRS):
            gt_matched = np.zeros(G, bool)
            for d in range(D):
                best_iou = min(thr, 1 - 1e-10)
                best_g = -1
                for g in range(G):
                    if gt_matched[g]:
                        continue
                    # once we hit ignored gts, only continue if no match yet
                    if best_g > -1 and not gt_ignore[best_g] and gt_ignore[g]:
                        break
                    if ious[d, g] < best_iou:
                        continue
                    best_iou = ious[d, g]
                    best_g = g
                if best_g >= 0:
                    gt_matched[best_g] = True
                    if gt_ignore[best_g]:
                        det_ig[t, d] = True
                    else:
                        tp[t, d] = True
        # unmatched dets outside the area range are ignored
        det_area = np.clip(dets[:, 2] - dets[:, 0], 0, None) * np.clip(
            dets[:, 3] - dets[:, 1], 0, None)
        out_of_range = (det_area < area_rng[0]) | (det_area > area_rng[1])
        for t in range(T):
            det_ig[t] |= (~tp[t]) & out_of_range
        n_gt = int((~gt_ignore).sum())
        return tp, det_ig, det_scores[order], n_gt

    def _accumulate(self, area_name):
        """-> precision [T, R, K], recall [T, K]."""
        area_rng = AREA_RANGES[area_name]
        T, R, K = len(IOU_THRS), len(RECALL_THRS), self.num_classes
        precision = -np.ones((T, R, K))
        recall = -np.ones((T, K))

        for k in range(K):
            all_tp, all_ig, all_scores = [], [], []
            total_gt = 0
            for img in self._images:
                det_mask = img["det_classes"] == k
                gt_mask = img["gt_classes"] == k
                tp, det_ig, scores, n_gt = self._match_one(
                    img["det_boxes"][det_mask],
                    img["det_scores"][det_mask],
                    img["gt_boxes"][gt_mask], area_rng)
                all_tp.append(tp)
                all_ig.append(det_ig)
                all_scores.append(scores)
                total_gt += n_gt
            if total_gt == 0:
                continue
            scores = np.concatenate(all_scores)
            order = np.argsort(-scores, kind="mergesort")
            tp = np.concatenate(all_tp, axis=1)[:, order]
            ig = np.concatenate(all_ig, axis=1)[:, order]

            for t in range(T):
                keep = ~ig[t]
                tps = np.cumsum(tp[t][keep])
                fps = np.cumsum((~tp[t][keep]))
                rc = tps / total_gt
                pr = tps / np.clip(tps + fps, 1e-9, None)
                recall[t, k] = rc[-1] if rc.size else 0.0
                # make precision monotonically decreasing
                pr = np.maximum.accumulate(pr[::-1])[::-1] if pr.size else pr
                # 101-point interpolation
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(R)
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                precision[t, :, k] = q
        return precision, recall

    def compute(self) -> Dict[str, float]:
        stats = {}
        p_all, r_all = self._accumulate("all")

        def mean_valid(x):
            v = x[x > -1]
            return float(v.mean()) if v.size else -1.0

        stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"] = mean_valid(p_all)
        stats["IoU=0.5,area=all,maxDets=100,mAP"] = mean_valid(p_all[0])
        stats["IoU=0.75,area=all,maxDets=100,mAP"] = mean_valid(p_all[5])
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAR"] = mean_valid(r_all)
        for area in ("small", "medium", "large"):
            p, r = self._accumulate(area)
            stats[f"IoU=0.5:0.95,area={area},maxDets=100,mAP"] = mean_valid(p)
            stats[f"IoU=0.5:0.95,area={area},maxDets=100,mAR"] = mean_valid(r)
        return stats


def evaluate_coco_detection_map(per_image_results: Sequence[dict],
                                num_classes: int) -> Dict[str, float]:
    """per_image_results: iterable of dicts with det_boxes/det_scores/
    det_classes/gt_boxes/gt_classes."""
    ev = CocoMAPEvaluator(num_classes)
    for r in per_image_results:
        ev.add_image(**r)
    return ev.compute()
