"""DBNet text-detection data pipeline (parity: reference
simpleAICV/text_detection/text_detection_dataset.py + common.py — generates
probability (shrunk polygon) masks, threshold (border distance) maps, and
ignore masks on a fixed square canvas).

Implementation note: the reference shrinks/expands polygons with pyclipper
(not available here); we use cv2 erode/dilate with a kernel radius equal to
the DB offset  d = area*(1-r^2)/perimeter  — the same offset distance applied
morphologically, which converges to polygon offsetting for the text-shaped
regions involved.
"""

from __future__ import annotations

import random
from typing import List, Optional

import cv2
import numpy as np

__all__ = ["DBNetMapGenerator", "TextDetectionCollater",
           "FakeTextDetectionDataset"]


def _poly_offset_distance(poly: np.ndarray, shrink_ratio: float) -> float:
    area = cv2.contourArea(poly.astype(np.float32))
    peri = cv2.arcLength(poly.astype(np.float32), True)
    if peri < 1e-4:
        return 0.0
    return area * (1.0 - shrink_ratio**2) / peri


def _disk(radius: int):
    r = max(int(round(radius)), 1)
    return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1, 2 * r + 1))


class DBNetMapGenerator:
    """Sample: {'image', 'annots': list of [N,2] polygons, 'ignore_flags'} ->
    adds probability/threshold masks + ignore masks."""

    def __init__(self, shrink_ratio=0.4, thresh_min=0.3, thresh_max=0.7):
        self.shrink_ratio = shrink_ratio
        self.thresh_min = thresh_min
        self.thresh_max = thresh_max

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        polys: List[np.ndarray] = sample.get("annots", [])
        ignore_flags = sample.get("ignore_flags", [False] * len(polys))

        prob_mask = np.zeros((h, w), np.float32)
        prob_ignore = np.ones((h, w), np.float32)
        thresh_mask = np.zeros((h, w), np.float32)
        thresh_ignore = np.zeros((h, w), np.float32)

        for poly, ignore in zip(polys, ignore_flags):
            poly = np.asarray(poly, np.int32)
            if ignore or cv2.contourArea(poly.astype(np.float32)) < 16:
                cv2.fillPoly(prob_ignore, [poly], 0.0)
                continue
            d = _poly_offset_distance(poly, self.shrink_ratio)
            full = np.zeros((h, w), np.uint8)
            cv2.fillPoly(full, [poly], 1)
            shrunk = cv2.erode(full, _disk(d)) if d >= 1 else full
            prob_mask = np.maximum(prob_mask, shrunk.astype(np.float32))
            # threshold map: distance-to-boundary ramp inside dilated band
            dilated = cv2.dilate(full, _disk(d))
            band = dilated.astype(np.float32)
            dist_in = cv2.distanceTransform((dilated > 0).astype(np.uint8),
                                            cv2.DIST_L2, 3)
            dist_out = cv2.distanceTransform((dilated == 0).astype(np.uint8),
                                             cv2.DIST_L2, 3)
            # signed distance to the *original* polygon boundary, normalised
            edge = np.zeros((h, w), np.uint8)
            cv2.polylines(edge, [poly], True, 1)
            dist_edge = cv2.distanceTransform(1 - edge, cv2.DIST_L2, 3)
            tval = np.clip(1.0 - dist_edge / max(d, 1.0), 0.0, 1.0)
            thresh_mask = np.maximum(thresh_mask, tval * band)
            thresh_ignore = np.maximum(thresh_ignore, band)

        thresh_mask = thresh_mask * (self.thresh_max -
                                     self.thresh_min) + self.thresh_min
        sample["probability_mask"] = prob_mask
        sample["probability_ignore_mask"] = prob_ignore
        sample["threshold_mask"] = thresh_mask
        sample["threshold_ignore_mask"] = thresh_ignore
        return sample


class TextDetectionCollater:

    def __init__(self, resize=960):
        self.resize = resize

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        out = {
            "image": np.zeros((n, r, r, 3), np.float32),
            "probability_mask": np.zeros((n, r, r), np.float32),
            "probability_ignore_mask": np.zeros((n, r, r), np.float32),
            "threshold_mask": np.zeros((n, r, r), np.float32),
            "threshold_ignore_mask": np.zeros((n, r, r), np.float32),
        }
        all_polys = []
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            out["image"][i, :h, :w] = img / 255.0
            for key in ("probability_mask", "probability_ignore_mask",
                        "threshold_mask", "threshold_ignore_mask"):
                out[key][i, :h, :w] = s[key]
            all_polys.append(s.get("annots", []))
        out["polys"] = all_polys
        return out


class FakeTextDetectionDataset:
    """Synthetic: white rectangles as 'text regions'."""

    def __init__(self, num_samples=32, image_hw=160,
                 map_generator: Optional[DBNetMapGenerator] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.map_generator = map_generator or DBNetMapGenerator()

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        hw = self.image_hw
        image = rng.uniform(0, 50, (hw, hw, 3)).astype(np.float32)
        polys = []
        for _ in range(rng.randint(1, 4)):
            w = rng.randint(hw // 4, hw // 2)
            h = rng.randint(hw // 10, hw // 5)
            x, y = rng.randint(0, hw - w), rng.randint(0, hw - h)
            image[y:y + h, x:x + w] = 230.0
            polys.append(np.array([[x, y], [x + w, y], [x + w, y + h],
                                   [x, y + h]], np.float32))
        sample = {"image": image, "annots": polys,
                  "ignore_flags": [False] * len(polys)}
        return self.map_generator(sample)


class DBNetDecoder:
    """Host-side decode (parity: reference
    simpleAICV/text_detection/decode.py:19-162): threshold prob map, find
    contours, classify line vs curve text by contour-area / min-rect-area
    ratio, unclip by the DB offset D = A*ratio/L via geometric round-join
    polygon offsetting (ops/polygon.py — the pyclipper JT_ROUND equivalent),
    clip to the image rectangle, min-rect for line text / polygon for curve
    text, score by mean prob inside the contour."""

    def __init__(self, use_morph_open=False, hard_border_threshold=None,
                 box_score_threshold=0.5, min_area_size=9,
                 max_box_num=1000, rectangle_similarity=0.6,
                 min_box_size=3, line_text_expand_ratio=1.2,
                 curve_text_expand_ratio=1.5):
        self.box_score_threshold = box_score_threshold
        self.min_area_size = min_area_size
        self.max_box_num = max_box_num
        self.min_box_size = min_box_size
        self.rectangle_similarity = rectangle_similarity
        self.line_text_expand_ratio = line_text_expand_ratio
        self.curve_text_expand_ratio = curve_text_expand_ratio
        self.prob_threshold = hard_border_threshold or 0.3

    def __call__(self, preds, sizes=None):
        """preds: [B,H,W,2] numpy -> list of (boxes, scores); ``boxes`` is a
        list of [K_i,2] float32 polygons (4-point for line text, sampled
        round-join polygons for curve text, reference decode.py:119-162)."""
        from ..ops.polygon import (clip_polygon_to_rect, offset_polygon,
                                   unclip_distance)
        preds = np.asarray(preds)
        results = []
        for i in range(preds.shape[0]):
            prob = preds[i, :, :, 0]
            h, w = prob.shape
            binary = (prob > self.prob_threshold).astype(np.uint8)
            contours, _ = cv2.findContours(binary, cv2.RETR_LIST,
                                           cv2.CHAIN_APPROX_SIMPLE)
            boxes, scores = [], []
            for cnt in contours[:self.max_box_num]:
                area = cv2.contourArea(cnt)
                if area < self.min_area_size:
                    continue
                mask = np.zeros_like(binary)
                cv2.drawContours(mask, [cnt], -1, 1, -1)
                score = float((prob * mask).sum() / max(mask.sum(), 1))
                if score < self.box_score_threshold:
                    continue
                rect0 = cv2.minAreaRect(cnt)
                enclose_area = rect0[1][0] * rect0[1][1]
                if enclose_area < 1:
                    continue
                is_curve = area / enclose_area < self.rectangle_similarity
                poly = cnt.reshape(-1, 2).astype(np.float32)
                if is_curve:
                    eps = 1e-3 * cv2.arcLength(cnt, True)
                    poly = cv2.approxPolyDP(cnt, eps, True).reshape(-1, 2)
                if poly.shape[0] < 4:
                    continue
                ratio = (self.curve_text_expand_ratio if is_curve
                         else self.line_text_expand_ratio)
                d = unclip_distance(poly, ratio)
                grown = offset_polygon(poly, max(d, 1e-3))
                grown = clip_polygon_to_rect(grown, w, h)
                if grown.shape[0] < 4:
                    continue
                rect = cv2.minAreaRect(grown.reshape(-1, 1, 2))
                if min(rect[1]) < self.min_box_size:
                    continue
                if is_curve:
                    boxes.append(grown.astype(np.float32))
                else:
                    boxes.append(cv2.boxPoints(rect).astype(np.float32))
                scores.append(score)
            results.append((boxes, np.asarray(scores, np.float32)))
        return results
