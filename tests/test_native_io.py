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


def test_plain_resize_mode_matches_cv2_stretch(tmp_path):
    """letterbox=False = reference classification Resize (plain stretch)."""
    (p,) = _write_jpegs(tmp_path, [(80, 160)])
    out = native_io.decode_resize(open(p, "rb").read(), (64, 64),
                                  letterbox=False)
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32)
    ref = cv2.resize(ref, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out - ref).mean() < 3.0


def test_ilsvrc_native_fallback_geometry(tmp_path):
    """Non-JPEG files under native_decode_hw get the same (hw, hw) stretch
    geometry via the cv2 fallback — batch shapes stay uniform."""
    import os
    d = tmp_path / "train" / "class0"
    os.makedirs(d)
    _write_jpegs(d, [(96, 128)])
    png = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(d / "sneaky.JPEG.png"), png)
    # a PNG disguised with a .JPEG name (real ImageNet quirk)
    os.rename(str(d / "sneaky.JPEG.png"), str(d / "im_png.JPEG"))
    from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
    ds = ILSVRC2012Dataset(str(tmp_path), "train", native_decode_hw=64)
    shapes = {ds[i]["image"].shape for i in range(len(ds))}
    assert shapes == {(64, 64, 3)}
