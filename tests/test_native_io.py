"""Native JPEG batch decode (csrc/native_io.cpp) vs cv2 reference."""

import os

import numpy as np
import pytest

from simpleaicv_tpu.data import native_io

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="libsimpleaicv_io.so not built")


def _write_jpegs(tmp_path, shapes, quality=95):
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate(shapes):
        # smooth image so JPEG loss is small and comparisons are tight
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            127 + 80 * np.sin(xx / w * 4 + i),
            127 + 80 * np.cos(yy / h * 3),
            127 + 60 * np.sin((xx + yy) / (h + w) * 5),
        ], axis=-1).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        paths.append(p)
    return paths


def test_single_decode_matches_cv2(tmp_path):
    (p,) = _write_jpegs(tmp_path, [(96, 128)])
    out = native_io.decode_resize(open(p, "rb").read(), (48, 64))
    assert out is not None and out.shape == (48, 64, 3)
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(ref.astype(np.float32), (64, 48),
                     interpolation=cv2.INTER_LINEAR)
    # same letterbox geometry here (exact 2x), so only resample diffs remain
    assert np.abs(out - ref).mean() < 3.0


def test_batch_decode_letterbox_and_failures(tmp_path):
    paths = _write_jpegs(tmp_path, [(64, 64), (128, 64), (40, 200)])
    bad = str(tmp_path / "broken.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    batch = native_io.batch_decode_files(paths + [bad], 64, n_threads=4,
                                         pad_value=7.0)
    assert batch.shape == (4, 64, 64, 3)
    # portrait 128x64 letterboxed: right half padded
    assert np.all(batch[1, :, 33:, :] == 7.0)
    assert np.any(batch[1, :, :32, :] != 7.0)
    # wide 40x200 letterboxed: bottom padded (scale=0.32 -> 12 rows)
    assert np.all(batch[2, 14:, :, :] == 7.0)
    # corrupt file slot is fully padded, no crash
    assert np.all(batch[3] == 7.0)


def test_dct_scaled_decode_is_consistent(tmp_path):
    # large source, small target: exercises the 1/2..1/8 DCT downscale path
    (p,) = _write_jpegs(tmp_path, [(1024, 1536)])
    small = native_io.decode_resize(open(p, "rb").read(), (96, 96))
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32)
    scale = min(96 / 1024, 96 / 1536)
    rh, rw = round(1024 * scale), round(1536 * scale)
    ref_r = cv2.resize(ref, (rw, rh), interpolation=cv2.INTER_AREA)
    canvas = np.zeros((96, 96, 3), np.float32)
    canvas[:rh, :rw] = ref_r
    assert np.abs(small - canvas).mean() < 6.0
