"""COCO compressed RLE codec (data/rle.py) — round trips and hand fixtures
(parity: pycocotools mask.encode/decode semantics, reference SA-1B
preprocessing 001.convert_png_jpg_label_to_json_label.py:93-95)."""

import numpy as np

from simpleaicv_tpu.data.rle import (rle_encode, rle_decode,
                                     mask_to_rle_counts, rle_counts_to_mask)


def test_uncompressed_counts_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = (rng.rand(13, 7) > 0.5).astype(np.uint8)
        counts = mask_to_rle_counts(mask)
        assert sum(counts) == mask.size
        np.testing.assert_array_equal(rle_counts_to_mask(counts, 13, 7),
                                      mask)


def test_counts_start_with_zero_run():
    mask = np.ones((3, 3), np.uint8)
    counts = mask_to_rle_counts(mask)
    assert counts[0] == 0 and counts[1] == 9


def test_compressed_roundtrip_random():
    rng = np.random.RandomState(1)
    for shape in [(1, 1), (7, 3), (64, 64), (100, 37)]:
        for p in (0.1, 0.5, 0.9):
            mask = (rng.rand(*shape) < p).astype(np.uint8)
            rle = rle_encode(mask)
            assert isinstance(rle["counts"], str)
            np.testing.assert_array_equal(rle_decode(rle), mask)


def test_compressed_roundtrip_blocky():
    # large smooth regions exercise multi-char (and negative-delta) counts
    mask = np.zeros((480, 640), np.uint8)
    mask[100:300, 200:500] = 1
    mask[350:400, 50:100] = 1
    rle = rle_encode(mask)
    np.testing.assert_array_equal(rle_decode(rle), mask)
    # delta coding: repeated column patterns cost ~2 chars per column,
    # orders of magnitude under the raw pixel count
    assert len(rle["counts"]) < 1500 < mask.size


def test_compressed_known_fixture():
    # single pixel set in a 2x2 mask, column-major: [idx run] semantics
    mask = np.array([[0, 1], [0, 0]], np.uint8)
    rle = rle_encode(mask)
    assert rle["size"] == [2, 2]
    # counts = [2, 1, 1] (two zeros: col0; one 1: (0,1); one 0: (1,1))
    assert rle_decode({"size": [2, 2], "counts": [2, 1, 1]})[0, 1] == 1
    np.testing.assert_array_equal(rle_decode(rle), mask)


def test_decode_uncompressed_list_form():
    mask = (np.arange(12).reshape(3, 4) % 3 == 0).astype(np.uint8)
    counts = mask_to_rle_counts(mask)
    np.testing.assert_array_equal(
        rle_decode({"size": [3, 4], "counts": counts}), mask)
