"""ctypes bindings for the C++ native ops library (csrc/native_ops.cpp).

Host-side oracles/fast-paths for the on-device kernels:
  * ``native_greedy_nms``   — reference-exact sequential greedy NMS;
  * ``native_ms_deform_attn`` — bilinear MSDA core (grid_sample semantics).

Build: ``make -C csrc`` (g++, no external deps). Auto-builds on first use if
the .so is missing and a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO_PATH = os.path.join(_CSRC, "libsimpleaicv_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int)]
    lib.ms_deform_attn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def native_greedy_nms(sorted_boxes: np.ndarray,
                      iou_threshold: float) -> np.ndarray:
    """[n,4] xyxy (score-descending) -> keep mask [n] bool."""
    lib = _load()
    assert lib is not None, "native library unavailable (run make -C csrc)"
    boxes = np.ascontiguousarray(sorted_boxes, np.float32)
    n = boxes.shape[0]
    keep = np.zeros(n, np.int32)
    lib.greedy_nms(boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
                   ctypes.c_float(iou_threshold),
                   keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep.astype(bool)


def native_ms_deform_attn(value: np.ndarray, spatial_shapes,
                          locations: np.ndarray,
                          weights: np.ndarray) -> np.ndarray:
    """Single image: value [S,H,D]; locations [Lq,H,L,P,2];
    weights [Lq,H,L,P] -> [Lq, H*D]."""
    lib = _load()
    assert lib is not None, "native library unavailable (run make -C csrc)"
    value = np.ascontiguousarray(value, np.float32)
    shapes = np.ascontiguousarray(np.asarray(spatial_shapes, np.int32))
    locations = np.ascontiguousarray(locations, np.float32)
    weights = np.ascontiguousarray(weights, np.float32)
    s, heads, dim = value.shape
    lq, _, l, p, _ = locations.shape
    out = np.zeros((lq, heads * dim), np.float32)
    lib.ms_deform_attn(
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        locations.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s, heads, dim, lq, l, p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
