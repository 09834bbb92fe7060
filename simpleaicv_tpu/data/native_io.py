"""ctypes bindings for the native data-IO library (csrc/native_io.cpp).

TPU-native replacement for the reference's C++ data path (torch DataLoader
worker processes; reference tools/scripts.py DataLoader(num_workers=...)):
one call decodes a whole batch of JPEGs with a C++ thread pool — libjpeg
DCT-scaled decode (1/2, 1/4, 1/8 before IDCT when the target is small) +
bilinear letterbox resize — writing straight into the collated NHWC float32
batch buffer that the host->device transfer reads.

Falls back transparently when the .so is absent (``available()`` is False);
callers keep the cv2 per-image path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                 "libsimpleaicv_io.so"),
    "libsimpleaicv_io.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.sep in p else p)
        except OSError:
            continue
        lib.nio_version.restype = ctypes.c_int
        lib.nio_decode_resize_f32.restype = ctypes.c_int
        lib.nio_decode_resize_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
        ]
        lib.nio_batch_decode_files.restype = ctypes.c_int
        lib.nio_batch_decode_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        if lib.nio_version() >= 2:
            lib.nio_decode_resize_u8.restype = ctypes.c_int
            lib.nio_decode_resize_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_int,
            ]
            lib.nio_batch_decode_files_u8.restype = ctypes.c_int
            lib.nio_batch_decode_files_u8.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ]
            lib.nio_gather_records.restype = ctypes.c_int
            lib.nio_gather_records.argtypes = [
                ctypes.c_void_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int,
            ]
        _lib = lib
        return lib
    _lib = False
    return False


def available() -> bool:
    return bool(_load())


def decode_resize(data: bytes, hw: int | tuple, pad_value: float = 0.0,
                  letterbox: bool = True) -> Optional[np.ndarray]:
    """Decode one JPEG byte string to f32 HWC [0,255] at hw.

    letterbox=True: aspect-preserving with bottom/right padding (detection
    semantics); letterbox=False: plain stretch resize (the reference
    classification Resize). Returns None on decode failure."""
    lib = _load()
    if not lib:
        return None
    H, W = (hw, hw) if isinstance(hw, int) else hw
    out = np.empty((H, W, 3), np.float32)
    rc = lib.nio_decode_resize_f32(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, pad_value, int(letterbox))
    return out if rc == 0 else None


def batch_decode_files(paths: Sequence[str], hw: int | tuple,
                       n_threads: int = 0, pad_value: float = 0.0,
                       letterbox: bool = True) -> Optional[np.ndarray]:
    """Decode JPEG files into a collated [N, H, W, 3] f32 batch.

    Failed/corrupt files come back as pad_value-filled slots (training
    semantics: a bad sample becomes a constant image, never a crash).
    Returns None when the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    H, W = (hw, hw) if isinstance(hw, int) else hw
    n = len(paths)
    out = np.empty((n, H, W, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.nio_batch_decode_files(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, n_threads, pad_value, int(letterbox))
    return out


def decode_resize_u8(data: bytes, hw: int | tuple, pad_value: float = 0.0,
                     letterbox: bool = True) -> Optional[np.ndarray]:
    """Decode one JPEG byte string to uint8 HWC at hw (packed-cache lattice).
    Returns None when the library is absent/old or the decode fails."""
    lib = _load()
    if not lib or lib.nio_version() < 2:
        return None
    H, W = (hw, hw) if isinstance(hw, int) else hw
    out = np.empty((H, W, 3), np.uint8)
    rc = lib.nio_decode_resize_u8(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, pad_value, int(letterbox))
    return out if rc == 0 else None


def batch_decode_files_u8(paths: Sequence[str], hw: int | tuple,
                          n_threads: int = 0, pad_value: float = 0.0,
                          letterbox: bool = True,
                          return_ok: bool = False):
    """Decode JPEG files into a collated [N, H, W, 3] uint8 batch.

    The C decoder pad-fills slots whose file is missing/corrupt; silently
    training on pad images would be a data bug, so the wrapper checks the
    returned ok count and warns when any slot failed. ``return_ok=True``
    additionally returns the ok count so callers (the pack writer) can
    account failures precisely."""
    lib = _load()
    if not lib or lib.nio_version() < 2:
        return (None, 0) if return_ok else None
    H, W = (hw, hw) if isinstance(hw, int) else hw
    n = len(paths)
    out = np.empty((n, H, W, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    ok = lib.nio_batch_decode_files_u8(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, n_threads, pad_value, int(letterbox))
    if ok < n:
        import warnings
        warnings.warn(
            f"native JPEG batch decode: {n - ok}/{n} files failed to "
            f"read/decode; those slots are pad-filled", stacklevel=2)
    return (out, int(ok)) if return_ok else out


def gather_records(base: np.ndarray, indices: np.ndarray,
                   out: Optional[np.ndarray] = None,
                   n_threads: int = 1) -> Optional[np.ndarray]:
    """Gather ``base[indices]`` along axis 0 with a GIL-released C memcpy
    loop (``base`` is typically an mmap'd packed-cache field). Returns None
    when the native library is unavailable (callers fall back to numpy
    fancy indexing, which is equivalent but holds the GIL)."""
    lib = _load()
    if not lib or lib.nio_version() < 2:
        return None
    idx = np.ascontiguousarray(indices, np.int64)
    rec_bytes = int(np.prod(base.shape[1:], dtype=np.int64)
                    * base.dtype.itemsize)
    if out is None:
        out = np.empty((len(idx),) + base.shape[1:], base.dtype)
    # np.memmap exposes its mapping through the ctypes/array interface
    base_ptr = base.ctypes.data_as(ctypes.c_void_p)
    lib.nio_gather_records(
        base_ptr, rec_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(idx),
        out.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out
