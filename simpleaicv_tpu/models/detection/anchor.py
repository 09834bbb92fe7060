"""Anchor / position generation (parity: reference
simpleAICV/detection/models/anchor.py:5-130). Host-side numpy; the generated
arrays are compile-time constants folded into the jitted loss/decode graphs
(feature sizes are static under XLA)."""

from __future__ import annotations

import math

import numpy as np


class RetinaAnchors:

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256), (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128)):
        self.areas = np.array(areas, np.float32)
        self.ratios = np.array(ratios, np.float32)
        self.scales = np.array(scales, np.float32)
        self.strides = np.array(strides, np.float32)

    def __call__(self, fpn_feature_sizes):
        """fpn_feature_sizes: [[W,H], ...] per level -> list of [H,W,A,4]
        xyxy anchors."""
        out = []
        for idx, area in enumerate(self.areas):
            base = self.generate_base_anchors(area, self.scales, self.ratios)
            out.append(self.generate_anchors_on_feature_map(
                base, fpn_feature_sizes[idx], self.strides[idx]))
        return out

    def generate_base_anchors(self, area, scales, ratios):
        aspects = np.array([[[s * math.sqrt(r), s * math.sqrt(1 / r)]
                             for s in scales] for r in ratios],
                           np.float32).reshape(-1, 2)
        base = np.zeros((len(scales) * len(ratios), 4), np.float32)
        wh = area * aspects
        base[:, 2:] += wh
        base[:, 0] -= base[:, 2] / 2
        base[:, 1] -= base[:, 3] / 2
        base[:, 2] /= 2
        base[:, 3] /= 2
        return base

    def generate_anchors_on_feature_map(self, base_anchors, fm_size, stride):
        w, h = int(fm_size[0]), int(fm_size[1])
        sx = (np.arange(w, dtype=np.float32) + 0.5) * stride
        sy = (np.arange(h, dtype=np.float32) + 0.5) * stride
        shift = np.stack(np.meshgrid(sx, sy), axis=-1)  # [h,w,2]
        shift = np.tile(shift, (1, 1, 2))[:, :, None, :]  # [h,w,1,4]
        return (base_anchors[None, None] + shift).astype(np.float32)

    def flat_anchors(self, fpn_feature_sizes) -> np.ndarray:
        """All levels concatenated: [sum(H*W*A), 4]."""
        return np.concatenate(
            [a.reshape(-1, 4) for a in self(fpn_feature_sizes)], axis=0)


class FCOSPositions:

    def __init__(self, strides=(8, 16, 32, 64, 128)):
        self.strides = np.array(strides, np.float32)

    def __call__(self, fpn_feature_sizes):
        out = []
        for stride, fm in zip(self.strides, fpn_feature_sizes):
            w, h = int(fm[0]), int(fm[1])
            sx = (np.arange(w, dtype=np.float32) + 0.5) * stride
            sy = (np.arange(h, dtype=np.float32) + 0.5) * stride
            out.append(np.stack(np.meshgrid(sx, sy), axis=-1).astype(
                np.float32))  # [h,w,2]
        return out

    def flat_positions_strides(self, fpn_feature_sizes):
        """-> ([P,2] positions, [P] strides)."""
        pos_levels = self(fpn_feature_sizes)
        pos = np.concatenate([p.reshape(-1, 2) for p in pos_levels], axis=0)
        strides = np.concatenate([
            np.full((p.shape[0] * p.shape[1],), s, np.float32)
            for p, s in zip(pos_levels, self.strides)
        ])
        return pos, strides
