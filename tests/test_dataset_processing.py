"""Dataset-preparation subsystem round trips: synthetic raw-download trees
-> processing -> load back through the real dataset readers (parity:
reference *_dataset_processing script dirs; see
simpleaicv_tpu/data/processing/)."""

import json
import os

import cv2
import numpy as np
import pytest

from simpleaicv_tpu.data.processing import (
    IGNORE_CHAR, normalize_text, process_art, process_celebamask_hq,
    process_face_synthetics, process_lip, process_mlt, process_rctw,
    process_rects, extract_text_lines, build_char_table,
    convert_mask_folder_to_sa1b)
from simpleaicv_tpu.data.processing.common import (
    is_simple_polygon, polygons_intersect, shrink_polygon,
    validate_and_standardize)
from simpleaicv_tpu.data.datasets.text import (TextDetection,
                                               TextRecognition)
from simpleaicv_tpu.data.datasets.combined_folder import HumanParsingDataset
from simpleaicv_tpu.data.datasets.sam_segmentation import \
    SAMSegmentationDataset
from simpleaicv_tpu.data.rle import rle_decode


# ---------------------------------------------------------------- helpers

def _canvas(h=240, w=320, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)


def _write_img(path, img):
    cv2.imwrite(path, img)


BOX_A = [[20, 20], [120, 20], [120, 60], [20, 60]]
BOX_B = [[150, 100], [280, 100], [280, 150], [150, 150]]


# ------------------------------------------------------------ text common

def test_normalize_text():
    assert normalize_text("ａｂ１，x y") == "ab1,xy"
    assert normalize_text("###") == IGNORE_CHAR
    assert normalize_text("＃") == IGNORE_CHAR
    assert normalize_text("（好）") == "(好)"


def test_polygon_checks():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    bowtie = np.array([[0, 0], [10, 10], [10, 0], [0, 10]], float)
    assert is_simple_polygon(square)
    assert not is_simple_polygon(bowtie)
    assert polygons_intersect(square, square + 5)
    assert not polygons_intersect(square, square + 20)
    # containment without edge crossing
    assert polygons_intersect(square * 4, square + 10)


def test_shrink_polygon_shrinks():
    big = np.array([[0, 0], [100, 0], [100, 40], [0, 40]], float)
    s = shrink_polygon(big, 0.6)
    assert s is not None
    assert s[:, 0].min() > 0 and s[:, 0].max() < 100
    # tiny polygon collapses -> None or unchanged-positive
    tiny = np.array([[0, 0], [3, 0], [3, 3], [0, 3]], float)
    out = shrink_polygon(tiny, 0.6)
    assert out is None or len(out) >= 3


def test_validate_rejects_bad_annotations():
    img = _canvas()
    ok = validate_and_standardize(img, [(BOX_A, "hello")], max_side=320)
    assert ok is not None
    # empty transcript
    assert validate_and_standardize(img, [(BOX_A, "")], max_side=320) is None
    # self-intersecting polygon
    bowtie = [[20, 20], [80, 80], [80, 20], [20, 80]]
    assert validate_and_standardize(img, [(bowtie, "x")],
                                    max_side=320) is None
    # sub-min-area polygon
    dot = [[20, 20], [22, 20], [22, 22], [20, 22]]
    assert validate_and_standardize(img, [(dot, "x")], max_side=320) is None
    # overlapping boxes (shrink collision)
    near = [[c[0] + 4, c[1] + 4] for c in BOX_A]
    assert validate_and_standardize(img, [(BOX_A, "a"), (near, "b")],
                                    max_side=320) is None
    # too-small image
    assert validate_and_standardize(_canvas(60, 60), [(BOX_A, "a")],
                                    max_side=320) is None


# -------------------------------------------------- text detection sources

def _assert_detection_loads(out_dir, set_name, expect_texts):
    ds = TextDetection(str(out_dir), [set_name], set_type="train")
    ds2 = TextDetection(str(out_dir), [set_name], set_type="test")
    total = len(ds) + len(ds2)
    assert total == 2, (len(ds), len(ds2))
    for d in (ds, ds2):
        for i in range(len(d)):
            s = d[i]
            assert s["image"].ndim == 3
            assert len(s["annots"]) == 2
            assert sum(s["ignore_flags"]) == 1  # the ### line
    labels = {}
    for st in ("train", "test"):
        with open(os.path.join(out_dir, set_name, f"{set_name}_{st}.json"),
                  encoding="utf-8") as f:
            labels.update(json.load(f))
    got = sorted(a["label"] for anns in labels.values() for a in anns)
    assert got == sorted(expect_texts), got


def test_process_rctw_roundtrip(tmp_path):
    root = tmp_path / "raw"
    (root / "train_images").mkdir(parents=True)
    (root / "train_gts").mkdir()
    for i in range(2):
        _write_img(str(root / "train_images" / f"image_{i}.jpg"),
                   _canvas(seed=i))
        lines = []
        for box, text in [(BOX_A, '"ｈｅｌｌo"'), (BOX_B, '"###"')]:
            coords = ",".join(str(v) for c in box for v in c)
            lines.append(f"{coords},0,{text}")
        (root / "train_gts" / f"image_{i}.txt").write_text(
            "\n".join(lines), encoding="utf-8")
    out = tmp_path / "out"
    stats = process_rctw(str(root), str(out), set_name="RCTW", log=None,
                         train_ratio=0.5, max_side=320)
    assert stats["seen"] == 2 and stats["train"] + stats["test"] == 2
    _assert_detection_loads(out, "RCTW",
                            ["hello", IGNORE_CHAR] * 2)


def test_process_art_lsvt_roundtrip(tmp_path):
    root = tmp_path / "raw"
    (root / "train_images").mkdir(parents=True)
    labels = {}
    for i in range(2):
        _write_img(str(root / "train_images" / f"gt_{i}.jpg"),
                   _canvas(seed=i))
        labels[f"gt_{i}"] = [
            {"points": BOX_A, "transcription": "你好"},
            {"points": BOX_B, "transcription": "bad",
             "illegibility": True}]
    (root / "train_labels.json").write_text(
        json.dumps(labels, ensure_ascii=False), encoding="utf-8")
    out = tmp_path / "out"
    stats = process_art(str(root), str(out), set_name="ART", log=None,
                        train_ratio=0.5, max_side=320)
    assert stats["train"] + stats["test"] == 2
    _assert_detection_loads(out, "ART", ["你好", IGNORE_CHAR] * 2)


def test_process_mlt_language_filter(tmp_path):
    root = tmp_path / "raw"
    (root / "train_images").mkdir(parents=True)
    (root / "train_gts").mkdir()
    coords_a = ",".join(str(v) for c in BOX_A for v in c)
    coords_b = ",".join(str(v) for c in BOX_B for v in c)
    # image 0: all-Latin -> kept; image 1: has Arabic line -> dropped whole
    _write_img(str(root / "train_images" / "img_0.jpg"), _canvas())
    (root / "train_gts" / "img_0.txt").write_text(
        f"{coords_a},Latin,word\n{coords_b},Chinese,字", encoding="utf-8")
    _write_img(str(root / "train_images" / "img_1.jpg"), _canvas(seed=1))
    (root / "train_gts" / "img_1.txt").write_text(
        f"{coords_a},Arabic,xxx", encoding="utf-8")
    out = tmp_path / "out"
    stats = process_mlt(str(root), str(out), set_name="MLT", log=None,
                        train_ratio=1.0, max_side=320)
    assert stats["seen"] == 1  # arabic image filtered before validation
    assert stats["train"] == 1 and stats["test"] == 0


def test_process_rects_roundtrip(tmp_path):
    root = tmp_path / "raw"
    (root / "img").mkdir(parents=True)
    (root / "gt").mkdir()
    _write_img(str(root / "img" / "r0.jpg"), _canvas())
    flat = lambda b: [v for c in b for v in c]
    (root / "gt" / "r0.json").write_text(json.dumps({
        "chars": [{"points": flat(BOX_A), "transcription": "字"},
                  {"points": flat(BOX_B), "transcription": "文"}]}),
        encoding="utf-8")
    out = tmp_path / "out"
    stats = process_rects(str(root), str(out), set_name="ReCTS", log=None,
                          train_ratio=1.0, max_side=320)
    assert stats["train"] == 1


# ------------------------------------------------------ recognition lines

def test_extract_text_lines_roundtrip(tmp_path):
    det_root = tmp_path / "det"
    set_name = "RCTW_text_detection"
    img_dir = det_root / set_name / "train"
    img_dir.mkdir(parents=True)
    img = _canvas()
    _write_img(str(img_dir / "a.jpg"), img)
    anns = [{"points": BOX_A, "label": "hello", "ignore": False},
            {"points": BOX_B, "label": IGNORE_CHAR, "ignore": True},
            # curved line: 6-point polygon (top run + bottom run)
            {"points": [[30, 150], [90, 140], [150, 150],
                        [150, 180], [90, 170], [30, 180]],
             "label": "curve", "ignore": False}]
    (det_root / set_name / f"{set_name}_train.json").write_text(
        json.dumps({"a.jpg": anns}), encoding="utf-8")

    # out dir name == out set name so TextRecognition finds the json
    out = tmp_path / "RCTW_text_recognition"
    stats = extract_text_lines(str(det_root), set_name, str(out), log=None,
                               set_types=("train",))
    assert stats["train"] == 2  # ignore line dropped
    ds = TextRecognition(str(out.parent), [out.name], set_type="train")
    assert len(ds) == 2
    texts = sorted(ds[i]["label"] for i in range(2))
    assert texts == ["curve", "hello"]
    # quad crop is the rectified strip: ~40px tall, ~100px wide
    crop = cv2.imread(str(out / "train" / "a_line0.jpg"))
    assert abs(crop.shape[0] - 40) <= 2 and abs(crop.shape[1] - 100) <= 2

    table = build_char_table(
        [str(out / "RCTW_text_recognition_train.json")],
        str(tmp_path / "table.json"))
    assert table == sorted(set("hellocurve"))


# ------------------------------------------------------------- parsing

def test_process_lip_roundtrip(tmp_path):
    root = tmp_path / "raw"
    for st in ("train", "val"):
        (root / "TrainVal_images" / f"{st}_images").mkdir(parents=True)
        (root / "TrainVal_parsing_annotations" /
         f"{st}_segmentations").mkdir(parents=True)
        _write_img(str(root / "TrainVal_images" / f"{st}_images" / "p0.jpg"),
                   _canvas(64, 64))
        mask = np.zeros((64, 64), np.uint8)
        mask[10:30, 10:30] = 13  # face
        cv2.imwrite(str(root / "TrainVal_parsing_annotations" /
                        f"{st}_segmentations" / "p0.png"), mask)
    # invalid-label mask must be skipped
    _write_img(str(root / "TrainVal_images" / "train_images" / "bad.jpg"),
               _canvas(64, 64))
    cv2.imwrite(str(root / "TrainVal_parsing_annotations" /
                    "train_segmentations" / "bad.png"),
                np.full((64, 64), 99, np.uint8))
    out = tmp_path / "out"
    stats = process_lip(str(root), str(out), log=None)
    assert stats == {"train": 1, "val": 1}
    ds = HumanParsingDataset(str(out), ["LIP"], set_type="train")
    assert len(ds) == 1
    s = ds[0]
    assert int(s["mask"].max()) == 13


def test_process_face_synthetics(tmp_path):
    root = tmp_path / "raw"
    (root / "images_and_annots").mkdir(parents=True)
    cv2.imwrite(str(root / "images_and_annots" / "000001.png"),
                _canvas(48, 48))
    seg = np.zeros((48, 48), np.uint8)
    seg[5:20, 5:20] = 1
    seg[30:40, 30:40] = 255  # 255 -> background
    cv2.imwrite(str(root / "images_and_annots" / "000001_seg.png"), seg)
    out = tmp_path / "out"
    stats = process_face_synthetics(str(root), str(out), log=None)
    assert stats == {"train": 1}
    mask = cv2.imread(
        str(out / "FaceSynthetics" / "train" / "FaceSynthetics_000001.png"),
        cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(mask)) == {0, 1}


def test_process_celebamask_hq(tmp_path):
    root = tmp_path / "raw"
    (root / "CelebA-HQ-img").mkdir(parents=True)
    (root / "CelebAMask-HQ-mask-anno" / "0").mkdir(parents=True)
    for idx, orig in [(0, 5), (1, 170000), (2, 190000)]:
        _write_img(str(root / "CelebA-HQ-img" / f"{idx}.jpg"),
                   _canvas(64, 64, seed=idx))
        part = np.zeros((64, 64), np.uint8)
        part[8:24, 8:24] = 255
        cv2.imwrite(str(root / "CelebAMask-HQ-mask-anno" / "0" /
                        f"{idx:05d}_skin.png"), part)
        hair = np.zeros((64, 64), np.uint8)
        hair[40:60, 40:60] = 255
        cv2.imwrite(str(root / "CelebAMask-HQ-mask-anno" / "0" /
                        f"{idx:05d}_hair.png"), hair)
    (root / "CelebA-HQ-to-CelebA-mapping.txt").write_text(
        "idx orig_idx orig_file\n0 5 a.jpg\n1 170000 b.jpg\n"
        "2 190000 c.jpg\n")
    out = tmp_path / "out"
    stats = process_celebamask_hq(str(root), str(out), log=None)
    assert stats == {"train": 1, "val": 1, "test": 1}
    mask = cv2.imread(str(out / "CelebAMask-HQ" / "train" /
                          "CelebAMask-HQ_0.png"), cv2.IMREAD_GRAYSCALE)
    # skin = class 1, hair = class 13 (part order + 1)
    assert set(np.unique(mask)) == {0, 1, 13}


# ---------------------------------------------------------------- SA-1B

def test_sam_mask_conversion_roundtrip(tmp_path):
    root = tmp_path / "pairs"
    (root / "train").mkdir(parents=True)
    _write_img(str(root / "train" / "s0.jpg"), _canvas(96, 128))
    mask = np.zeros((96, 128), np.uint8)
    mask[20:60, 30:100] = 255
    cv2.imwrite(str(root / "train" / "s0.png"), mask)
    out = tmp_path / "sa1b" / "myset"
    n = convert_mask_folder_to_sa1b(str(root), str(out), log=None)
    assert n == 1
    with open(out / "train" / "s0.json", encoding="utf-8") as f:
        rec = json.load(f)
    ann = rec["annotations"][0]
    assert ann["bbox"] == [30, 20, 70, 40]
    assert ann["area"] == 70 * 40
    np.testing.assert_array_equal(rle_decode(ann["segmentation"]),
                                  (mask > 0).astype(np.uint8))
    # loads through the SAM dataset (compressed-RLE decode path)
    ds = SAMSegmentationDataset(str(out.parent), [out.name],
                                set_type="train")
    assert len(ds) == 1
    s = ds[0]
    assert float(np.asarray(s["mask"]).sum()) == 70 * 40
