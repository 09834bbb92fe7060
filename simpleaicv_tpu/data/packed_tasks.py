"""Decode-once packed caches for the heavy-input verticals: COCO-style
detection and SA-1B-style SAM interactive segmentation.

The classification pack (data/packed.py) closed the JPEG-decode budget for
224² training (0.05 host cores vs 5.23). The 832²–1024² tasks are where
that budget actually bites — the reference feeds them with DataLoader
worker pools (reference tools/train_detection_model.py:74-94, and the
SA-1B pipelines under simpleAICV/interactive_segmentation/) assuming 16+
host cores per accelerator. Here every sample is letterbox-resized ONCE at
pack time to the training transport resolution and stored as a fixed-stride
uint8 record; steady-state epochs are a single C-memcpy gather per batch
(csrc/native_io.cpp nio_gather_records) plus a vectorised batch-dict
collate — no decode, no per-sample python.

Detection record (yolo_style geometry == data/detection.DetectionResize +
DetectionCollater):
  image [S,S,3] u8 (aspect-preserving long-side resize, top-left anchored,
  zero pad), annots [max_annots,5] f32 xyxy+class in canvas pixels (-1 pad),
  scale f32, size [2] f32 (pre-pad resized h,w).

SAM record (geometry == data/interactive_segmentation.SamResize + the
SAMBatchCollater canvas):
  image [S,S,3] u8, mask_bits [S,S//8] u8 (np.packbits of the binary gt
  mask — lossless, fixed stride; 8x smaller than raw, 24x smaller than the
  f32 mask), box [4] f32 (tight prompt box), point_candidates [K,2] f32
  (pre-sampled positive pixels the collater draws prompt points from, -1
  pad), scale f32.

The ``Packed*Collate`` classes operate on the GATHERED batch dict (not
per-sample lists) and carry ``packed_batch = True`` so core/trainer.py
routes PackedDataset train sets through the PackedLoader fast path with
them attached.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .packed import PackReader, PackWriter

__all__ = [
    "pack_detection_dataset", "PackedDetectionCollate",
    "pack_sam_dataset", "PackedSAMCollate",
]


def _letterbox_u8(image: np.ndarray, hw: int):
    """yolo_style long-side resize + top-left-anchored zero pad to a square
    uint8 canvas (geometry == data/detection.DetectionResize yolo_style +
    DetectionCollater's zero canvas)."""
    import cv2
    h, w = image.shape[:2]
    factor = hw / max(h, w)
    nh, nw = int(round(h * factor)), int(round(w * factor))
    resized = cv2.resize(image, (nw, nh))
    canvas = np.zeros((hw, hw, 3), np.uint8)
    canvas[:nh, :nw] = np.clip(np.round(
        np.asarray(resized, np.float32)), 0, 255).astype(np.uint8)
    return canvas, np.float32(factor), np.array([nh, nw], np.float32)


# ----------------------------------------------------------------------
# detection
# ----------------------------------------------------------------------

def pack_detection_dataset(dataset, out_path: str, image_hw: int = 1024,
                           max_annots: int = 100,
                           meta: Optional[dict] = None,
                           progress_every: int = 0) -> str:
    """Pack a detection dataset (samples {image [h,w,3] 0-255, annots
    [n,5] xyxy+class in ORIGINAL pixels} — e.g. datasets/coco.CocoDetection
    with transform=None) into fixed-stride records at the training canvas.

    Host random-flip augmentation is traded away on this path (the packed
    geometry is fixed); detection recipes that want flips should use the
    on-device pipeline or the folder path.
    """
    n = len(dataset)
    fields = {
        "image": ((image_hw, image_hw, 3), "uint8"),
        "annots": ((max_annots, 5), "float32"),
        "scale": ((), "float32"),
        "size": ((2,), "float32"),
    }
    m = {"task": "detection", "image_hw": image_hw,
         "max_annots": max_annots, "resize_type": "yolo_style"}
    m.update(meta or {})
    if getattr(dataset, "class_names", None):
        m.setdefault("class_names", list(dataset.class_names))
    with PackWriter(out_path, fields, n, meta=m) as w:
        for i in range(n):
            s = dataset[i]
            img, factor, size = _letterbox_u8(
                np.asarray(s["image"], np.float32), image_hw)
            annots = np.full((max_annots, 5), -1.0, np.float32)
            a = np.asarray(s["annots"], np.float32).reshape(-1, 5)
            if a.shape[0] > 0:
                a = a[:max_annots].copy()
                a[:, :4] *= factor
                annots[:a.shape[0]] = a
            w.add({"image": img, "annots": annots,
                   "scale": np.float32(s.get("scale", 1.0)) * factor,
                   "size": size}, index=i)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"packed {i + 1}/{n}")
    return out_path


class PackedDetectionCollate:
    """Gathered-batch collate: uint8 canvas -> the normalized f32 batch the
    detection train step consumes ({image /255, annots, scale, size} ==
    DetectionResize + Normalize + DetectionCollater output)."""

    packed_batch = True

    def __call__(self, batch):
        return {
            "image": batch["image"].astype(np.float32) / 255.0,
            "annots": batch["annots"],
            "scale": batch["scale"],
            "size": batch["size"],
        }


# ----------------------------------------------------------------------
# SAM
# ----------------------------------------------------------------------

def pack_sam_dataset(dataset, out_path: str, image_hw: int = 1024,
                     max_point_candidates: int = 32, seed: int = 0,
                     meta: Optional[dict] = None,
                     progress_every: int = 0) -> str:
    """Pack a SAM dataset (samples {image [h,w,3] 0-255, mask [h,w] binary}
    — e.g. datasets/sam_segmentation.SAMSegmentationDataset with
    transform=None) into fixed-stride records at the SAM canvas.

    The gt mask is stored bit-packed (lossless); the prompt box and a
    reservoir of positive-pixel candidates are precomputed so the collater
    never runs np.nonzero over a 1024² mask per sample at train time.
    """
    import cv2
    assert image_hw % 8 == 0, image_hw
    n = len(dataset)
    fields = {
        "image": ((image_hw, image_hw, 3), "uint8"),
        "mask_bits": ((image_hw, image_hw // 8), "uint8"),
        "box": ((4,), "float32"),
        "point_candidates": ((max_point_candidates, 2), "float32"),
        "scale": ((), "float32"),
    }
    m = {"task": "sam", "image_hw": image_hw,
         "max_point_candidates": max_point_candidates}
    m.update(meta or {})
    rng = np.random.RandomState(seed)
    with PackWriter(out_path, fields, n, meta=m) as w:
        for i in range(n):
            s = dataset[i]
            img, factor, size = _letterbox_u8(
                np.asarray(s["image"], np.float32), image_hw)
            nh, nw = int(size[0]), int(size[1])
            mask = cv2.resize(np.asarray(s["mask"], np.float32), (nw, nh),
                              interpolation=cv2.INTER_NEAREST)
            canvas = np.zeros((image_hw, image_hw), np.uint8)
            canvas[:nh, :nw] = (mask > 0.5).astype(np.uint8)

            ys, xs = np.nonzero(canvas)
            box = np.zeros(4, np.float32)
            cands = np.full((max_point_candidates, 2), -1.0, np.float32)
            if len(ys) > 0:
                box[:] = (xs.min(), ys.min(), xs.max(), ys.max())
                k = min(max_point_candidates, len(ys))
                sel = rng.choice(len(ys), k, replace=False)
                cands[:k, 0] = xs[sel]
                cands[:k, 1] = ys[sel]
            w.add({"image": img,
                   "mask_bits": np.packbits(canvas, axis=1),
                   "box": box, "point_candidates": cands,
                   "scale": np.float32(s.get("scale", 1.0)) * factor},
                  index=i)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"packed {i + 1}/{n}")
    return out_path


class PackedSAMCollate:
    """Gathered-batch collate -> the SAMBatchCollater batch contract:
    image [B,S,S,3] f32 /255, mask [B,S,S] f32, prompt_point
    [B,max_points,3] (-1 pad), prompt_box [B,4], prompt_mask [B,S/4,S/4,1]
    nearest-downsampled prior. Prompt points are drawn from the packed
    positive-pixel candidates (same distribution as sampling the mask's
    nonzero set: the candidates are a uniform reservoir of it)."""

    packed_batch = True

    def __init__(self, positive_point_num_range=(1, 9), max_points: int = 9,
                 use_noise_bbox: bool = True, seed: int = 0):
        self.point_range = positive_point_num_range
        self.max_points = max_points
        self.use_noise_bbox = use_noise_bbox
        self._rng = np.random.RandomState(seed)

    def __call__(self, batch):
        from .interactive_segmentation import noise_bbox
        imgs = batch["image"]
        b, s = imgs.shape[0], imgs.shape[1]
        mask = np.unpackbits(batch["mask_bits"], axis=2,
                             count=s).astype(np.float32)
        points = np.full((b, self.max_points, 3), -1.0, np.float32)
        boxes = np.asarray(batch["box"], np.float32).copy()
        cands = batch["point_candidates"]
        for i in range(b):
            valid = cands[i, :, 0] >= 0
            nv = int(valid.sum())
            if nv == 0:
                continue
            k = min(self._rng.randint(self.point_range[0],
                                      self.point_range[1] + 1),
                    self.max_points, nv)
            sel = self._rng.choice(nv, k, replace=False)
            points[i, :k, :2] = cands[i, sel]
            points[i, :k, 2] = 1.0
            if self.use_noise_bbox:
                boxes[i] = noise_bbox(boxes[i], s, s)
        return {
            "image": imgs.astype(np.float32) / 255.0,
            "mask": mask,
            "prompt_point": points,
            "prompt_box": boxes,
            "prompt_mask": mask[:, ::4, ::4, None],
        }
