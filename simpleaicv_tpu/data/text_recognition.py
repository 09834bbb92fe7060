"""Text-recognition data utilities (parity: reference
simpleAICV/text_recognition/common.py — CTCTextLabelConverter:578,
KeepRatioResizeTextRecognitionCollater:544 (32-high, pad to fixed width)).
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np

__all__ = ["CTCTextLabelConverter", "KeepRatioResizeTextRecognitionCollater",
           "FakeTextRecognitionDataset"]


class CTCTextLabelConverter:
    """chars <-> indices; index 0 is the CTC blank ('[B]').

    ``chars`` may be an explicit sequence, or the named tables
    ``"reference"`` (the reference's exact 12,111-char ordering —
    checkpoint-index-compatible) / ``"superset"`` (the deterministic
    generated superset, see data/char_table.py)."""

    def __init__(self, chars: Sequence[str] = "reference",
                 str_max_length: int = 80):
        if chars == "reference":
            from .char_table import reference_char_table
            chars = reference_char_table()
        elif chars == "superset":
            from .char_table import final_char_table
            chars = final_char_table()
        self.chars = list(chars)
        self.str_max_length = str_max_length
        self.char_to_idx = {c: i + 1 for i, c in enumerate(self.chars)}
        self.idx_to_char = {i + 1: c for i, c in enumerate(self.chars)}
        self.num_classes = len(self.chars) + 1

    def encode(self, texts: List[str]):
        b = len(texts)
        targets = np.zeros((b, self.str_max_length), np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, text in enumerate(texts):
            idxs = [self.char_to_idx[c] for c in text
                    if c in self.char_to_idx][:self.str_max_length]
            targets[i, :len(idxs)] = idxs
            lengths[i] = len(idxs)
        return targets, lengths

    def decode(self, pred_indices: np.ndarray) -> List[str]:
        """Greedy CTC decode [B,T] -> strings (collapse repeats, drop blank)."""
        out = []
        for seq in pred_indices:
            chars = []
            prev = -1
            for idx in seq:
                if idx != prev and idx != 0:
                    chars.append(self.idx_to_char.get(int(idx), ""))
                prev = idx
            out.append("".join(chars))
        return out


class KeepRatioResizeTextRecognitionCollater:
    """Resize to height ``resize_h`` keeping aspect, right-pad to a fixed
    ``resize_h x str_max_length*ratio`` canvas (reference common.py:544-577)."""

    def __init__(self, converter: CTCTextLabelConverter, resize_h: int = 32,
                 max_w: int = 512):
        self.converter = converter
        self.resize_h = resize_h
        self.max_w = max_w

    def __call__(self, samples):
        n = len(samples)
        images = np.zeros((n, self.resize_h, self.max_w, 3), np.float32)
        texts = []
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            nw = min(max(int(round(w * self.resize_h / h)), 1), self.max_w)
            img = cv2.resize(img, (nw, self.resize_h))
            images[i, :, :nw] = img / 255.0
            texts.append(s["label"])
        targets, lengths = self.converter.encode(texts)
        return {"image": images, "targets": targets,
                "target_lengths": lengths, "texts": texts}


class FakeTextRecognitionDataset:
    """Synthetic: renders digit strings with cv2.putText."""

    def __init__(self, num_samples=64, transform=None):
        self.num_samples = num_samples
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        n_chars = rng.randint(3, 8)
        text = "".join(str(rng.randint(0, 10)) for _ in range(n_chars))
        img = np.full((48, 36 * n_chars, 3), 255, np.uint8)
        cv2.putText(img, text, (4, 36), cv2.FONT_HERSHEY_SIMPLEX, 1.2,
                    (0, 0, 0), 2)
        sample = {"image": img.astype(np.float32), "label": text}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
