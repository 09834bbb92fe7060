"""AutoAugment / RandAugment (parity: reference
simpleAICV/classification/auto_rand_augment.py:36-690 — the full op zoo
(shear/translate rel+abs, rotate, auto-contrast, invert, equalize, solarize,
solarize-add, posterize incl. the 'original' and 'increasing' variants, the
four enhance ops and their increasing variants), AugmentOp with magnitude
std jitter, and the v0 / v0r / original / originalr ImageNet policies).

Host-side, PIL-backed (the standard op definitions; policy tables are the
published AutoAugment/EfficientNet-TPU constants). Input/output is the
sample-dict convention with float32 HWC images in [0, 255].
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = ["AutoAugment", "RandAugment", "AugmentOp", "auto_augment_policy"]

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)
_TRANSLATE_CONST = 250  # reference _HPARAMS_DEFAULT translate_const


def _to_pil(image):
    return Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))


def _to_np(img):
    return np.asarray(img).astype(np.float32)


# ---------------- image ops (reference :50-171) ----------------

def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x_rel(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y_rel(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]), fillcolor=_FILL)


def _translate_x_abs(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0),
                         fillcolor=_FILL)


def _translate_y_abs(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v),
                         fillcolor=_FILL)


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int64)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _posterize(img, bits_to_keep):
    """numpy posterize supporting bits_to_keep == 0 (all-black, the TPU
    EfficientNet behavior the reference's v0 table comments on); PIL's
    ImageOps.posterize rejects bits < 1."""
    bits_to_keep = int(np.clip(bits_to_keep, 0, 8))
    if bits_to_keep >= 8:
        return img
    mask = 0 if bits_to_keep == 0 else (0xFF << (8 - bits_to_keep)) & 0xFF
    arr = np.asarray(img).astype(np.uint8) & np.uint8(mask)
    return Image.fromarray(arr)


def _enhance(cls):
    return lambda img, v: cls(img).enhance(v)


_OP_FNS = {
    "AutoContrast": lambda img, v: ImageOps.autocontrast(img),
    "Equalize": lambda img, v: ImageOps.equalize(img),
    "Invert": lambda img, v: ImageOps.invert(img),
    "Rotate": lambda img, v: img.rotate(v, fillcolor=_FILL),
    "Posterize": lambda img, v: _posterize(img, int(v)),
    "PosterizeIncreasing": lambda img, v: _posterize(img, int(v)),
    "PosterizeOriginal": lambda img, v: _posterize(img, int(v)),
    "Solarize": lambda img, v: ImageOps.solarize(img, int(v)),
    "SolarizeIncreasing": lambda img, v: ImageOps.solarize(img, int(v)),
    "SolarizeAdd": lambda img, v: _solarize_add(img, int(v)),
    "Color": _enhance(ImageEnhance.Color),
    "ColorIncreasing": _enhance(ImageEnhance.Color),
    "Contrast": _enhance(ImageEnhance.Contrast),
    "ContrastIncreasing": _enhance(ImageEnhance.Contrast),
    "Brightness": _enhance(ImageEnhance.Brightness),
    "BrightnessIncreasing": _enhance(ImageEnhance.Brightness),
    "Sharpness": _enhance(ImageEnhance.Sharpness),
    "SharpnessIncreasing": _enhance(ImageEnhance.Sharpness),
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x_abs,
    "TranslateY": _translate_y_abs,
    "TranslateXRel": _translate_x_rel,
    "TranslateYRel": _translate_y_rel,
}


# ---------------- level -> arg maps (reference :173-312) ----------------

def _negate(v):
    return -v if random.random() < 0.5 else v


def _level_to_arg(op_name, level):
    m = level / _MAX_LEVEL
    if op_name in ("ShearX", "ShearY"):
        return _negate(0.3 * m)
    if op_name in ("TranslateX", "TranslateY"):
        return _negate(_TRANSLATE_CONST * m)
    if op_name in ("TranslateXRel", "TranslateYRel"):
        return _negate(0.45 * m)
    if op_name == "Rotate":
        return _negate(30.0 * m)
    if op_name == "Posterize":
        # reference _posterize_level_to_arg: bits kept 0..4 ('black image
        # with Tpu posterize' comment in the v0 table)
        return int(4 * m)
    if op_name == "PosterizeIncreasing":
        return 4 - int(4 * m)
    if op_name == "PosterizeOriginal":
        return int(4 * m) + 4
    if op_name == "Solarize":
        return min(256, int(256 * m))
    if op_name == "SolarizeIncreasing":
        return 256 - min(256, int(256 * m))
    if op_name == "SolarizeAdd":
        return min(128, int(110 * m))
    if op_name in ("Color", "Contrast", "Brightness", "Sharpness"):
        # reference _enhance_level_to_arg: monotonic [0.1, 1.9], no negation
        return 1.8 * m + 0.1
    if op_name in ("ColorIncreasing", "ContrastIncreasing",
                   "BrightnessIncreasing", "SharpnessIncreasing"):
        # reference _enhance_increasing_level_to_arg: 1.0 +/- 0.9*m, >= 0.1
        return max(0.1, 1.0 + _negate(0.9 * m))
    return 0


class AugmentOp:
    """(name, prob, magnitude) with the reference's magnitude-std jitter
    (AugmentOp :314-356, magnitude_std via hparams)."""

    def __init__(self, name, prob, level, magnitude_std: float = 0.0):
        self.name = name
        self.prob = prob
        self.level = level
        self.magnitude_std = magnitude_std

    def __call__(self, img):
        if self.prob < 1.0 and random.random() > self.prob:
            return img
        level = self.level
        if self.magnitude_std > 0:
            level = random.gauss(level, self.magnitude_std)
        level = min(max(level, 0.0), _MAX_LEVEL)
        return _OP_FNS[self.name](img, _level_to_arg(self.name, level))


# ---------------- ImageNet policies (reference :358-496) ----------------

_POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

_POLICY_ORIGINAL = [
    [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


def _swap(table, a, b):
    return [[(b if name == a else name, p, m) for name, p, m in sub]
            for sub in table]


_POLICIES = {
    "v0": _POLICY_V0,
    "v0r": _swap(_POLICY_V0, "Posterize", "PosterizeIncreasing"),
    "original": _POLICY_ORIGINAL,
    "originalr": _swap(_POLICY_ORIGINAL, "PosterizeOriginal",
                       "PosterizeIncreasing"),
}


def auto_augment_policy(name: str = "v0", magnitude_std: float = 0.0):
    table = _POLICIES[name]
    return [[AugmentOp(*args, magnitude_std=magnitude_std) for args in sub]
            for sub in table]


class AutoAugment:
    """policy in {'v0','v0r','original','originalr'}
    (reference auto_augment_policy :496-505)."""

    def __init__(self, policy: str = "v0", magnitude_std: float = 0.0):
        self.policy = auto_augment_policy(policy, magnitude_std)

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        for op in random.choice(self.policy):
            img = op(img)
        sample["image"] = _to_np(img)
        return sample


# RandAugment op sets (reference :508-560 _RAND_TRANSFORMS /
# _RAND_INCREASING_TRANSFORMS)
_RAND_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel",
]
_RAND_INCREASING_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]


class RandAugment:
    """RandAugment(N, M) with optional magnitude-std and the 'increasing'
    transform set (reference :562-690)."""

    def __init__(self, N: int = 2, M: float = 9.0, prob: float = 0.5,
                 magnitude_std: float = 0.5, increasing: bool = True):
        self.N = N
        self.M = M
        self.prob = prob
        self.magnitude_std = magnitude_std
        self.op_names = (_RAND_INCREASING_TRANSFORMS if increasing
                         else _RAND_TRANSFORMS)

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        for name in random.choices(self.op_names, k=self.N):
            img = AugmentOp(name, self.prob, self.M,
                            magnitude_std=self.magnitude_std)(img)
        sample["image"] = _to_np(img)
        return sample
