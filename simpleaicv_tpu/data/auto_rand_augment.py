"""AutoAugment / RandAugment (parity: reference
simpleAICV/classification/auto_rand_augment.py:314-690 — AugmentOp + ImageNet
AutoAugment policy + RandAugment(N, M)).

Host-side, PIL-backed (the standard op definitions). Input/output is the
sample-dict convention with float32 HWC images in [0, 255].
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = ["AutoAugment", "RandAugment"]

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _to_pil(image):
    return Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))


def _to_np(img):
    return np.asarray(img).astype(np.float32)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]), fillcolor=_FILL)


def _enhance(cls):
    return lambda img, v: cls(img).enhance(v)


_OPS = {
    "AutoContrast": lambda img, v: ImageOps.autocontrast(img),
    "Equalize": lambda img, v: ImageOps.equalize(img),
    "Invert": lambda img, v: ImageOps.invert(img),
    "Rotate": lambda img, v: img.rotate(v, fillcolor=_FILL),
    "Posterize": lambda img, v: ImageOps.posterize(img, max(1, int(v))),
    "Solarize": lambda img, v: ImageOps.solarize(img, int(v)),
    "SolarizeAdd": lambda img, v: _solarize_add(img, int(v)),
    "Color": _enhance(ImageEnhance.Color),
    "Contrast": _enhance(ImageEnhance.Contrast),
    "Brightness": _enhance(ImageEnhance.Brightness),
    "Sharpness": _enhance(ImageEnhance.Sharpness),
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int64)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _level_to_arg(op_name, level):
    m = level / _MAX_LEVEL
    if op_name in ("ShearX", "ShearY"):
        v = 0.3 * m
        return -v if random.random() < 0.5 else v
    if op_name in ("TranslateX", "TranslateY"):
        v = 0.45 * m
        return -v if random.random() < 0.5 else v
    if op_name == "Rotate":
        v = 30.0 * m
        return -v if random.random() < 0.5 else v
    if op_name == "Posterize":
        return 8 - int(4 * m)
    if op_name == "Solarize":
        return int(256 * (1 - m))
    if op_name == "SolarizeAdd":
        return int(110 * m)
    if op_name in ("Color", "Contrast", "Brightness", "Sharpness"):
        return 1.0 + 0.9 * m * (-1 if random.random() < 0.5 else 1)
    return 0


class AugmentOp:

    def __init__(self, name, prob, level):
        self.name = name
        self.prob = prob
        self.level = level

    def __call__(self, img):
        if random.random() > self.prob:
            return img
        return _OPS[self.name](img, _level_to_arg(self.name, self.level))


# AutoAugment ImageNet policy (v0), (op, prob, magnitude) pairs
_IMAGENET_POLICY = [
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
    [("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)],
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


class AutoAugment:

    def __init__(self):
        self.policy = [[AugmentOp(*args) for args in sub]
                       for sub in _IMAGENET_POLICY]

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        for op in random.choice(self.policy):
            img = op(img)
        sample["image"] = _to_np(img)
        return sample


class RandAugment:

    def __init__(self, N: int = 2, M: float = 9.0, prob: float = 0.5):
        self.N = N
        self.M = M
        self.prob = prob
        self.op_names = list(_OPS.keys())

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        for name in random.choices(self.op_names, k=self.N):
            img = AugmentOp(name, self.prob, self.M)(img)
        sample["image"] = _to_np(img)
        return sample
