"""Geometric polygon offsetting tests (pyclipper JT_ROUND equivalent used by
DBNet decode — reference simpleAICV/text_detection/decode.py:131-144).

pyclipper isn't in the environment, so correctness is established by the
mathematical definition of the Minkowski sum with a disk: every boundary
point of the offset polygon lies at distance d from the input polygon, and
the offset strictly contains the input. Plus a known-area check: offsetting
a convex polygon by d gives area A + P*d + pi*d^2.
"""

import numpy as np
import cv2

from simpleaicv_tpu.ops.polygon import (clip_polygon_to_rect, offset_polygon,
                                        polygon_area, polygon_perimeter,
                                        unclip_distance)


def point_to_polygon_distance(p, poly):
    """Min distance from point to closed polyline."""
    best = np.inf
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-12), 0, 1)
        best = min(best, np.linalg.norm(a + t * ab - p))
    return best


SQUARE = np.array([[10, 10], [50, 10], [50, 50], [10, 50]], np.float32)
LSHAPE = np.array([[0, 0], [40, 0], [40, 20], [20, 20], [20, 40], [0, 40]],
                  np.float32)
TRI = np.array([[5, 5], [60, 12], [30, 55]], np.float32)


def test_offset_square_area():
    d = 6.0
    out = offset_polygon(SQUARE, d, arc_tolerance=0.01)
    a0 = abs(polygon_area(SQUARE))
    p0 = polygon_perimeter(SQUARE)
    expect = a0 + p0 * d + np.pi * d * d
    got = abs(polygon_area(out))
    assert abs(got - expect) / expect < 0.005, (got, expect)


def test_offset_boundary_distance_convex():
    d = 5.0
    for poly in (SQUARE, TRI):
        out = offset_polygon(poly, d, arc_tolerance=0.05)
        for p in out:
            dist = point_to_polygon_distance(p, poly)
            assert abs(dist - d) < 0.1, (p, dist)


def test_offset_boundary_distance_concave():
    d = 3.0
    out = offset_polygon(LSHAPE, d, arc_tolerance=0.05)
    for p in out:
        dist = point_to_polygon_distance(p, LSHAPE)
        # reflex miter points may sit slightly farther than d; never closer
        assert dist > d - 0.15 and dist < d * 1.5 + 0.15, (p, dist)


def test_offset_contains_input():
    d = 4.0
    for poly in (SQUARE, LSHAPE, TRI):
        out = offset_polygon(poly, d, arc_tolerance=0.05).astype(np.float32)
        for p in poly:
            r = cv2.pointPolygonTest(out.reshape(-1, 1, 2), tuple(map(
                float, p)), True)
            assert r > d - 0.2, (p, r)  # inside with margin ~d


def test_offset_orientation_invariance():
    d = 5.0
    a = offset_polygon(SQUARE, d, arc_tolerance=0.01)
    b = offset_polygon(SQUARE[::-1].copy(), d, arc_tolerance=0.01)
    assert abs(abs(polygon_area(a)) - abs(polygon_area(b))) < 1e-3


def test_clip_to_rect():
    poly = np.array([[-10, 20], [30, -10], [70, 20], [30, 50]], np.float32)
    out = clip_polygon_to_rect(poly, 60, 40)
    assert len(out) >= 4
    assert out[:, 0].min() >= -1e-6 and out[:, 0].max() <= 60 + 1e-6
    assert out[:, 1].min() >= -1e-6 and out[:, 1].max() <= 40 + 1e-6
    # clipping is area-decreasing and keeps the interior
    assert 0 < abs(polygon_area(out)) <= abs(polygon_area(poly)) + 1e-6


def test_unclip_distance_matches_db_formula():
    # D = A * ratio / L (reference decode.py:129-130)
    d = unclip_distance(SQUARE, 1.5)
    a, per = 40.0 * 40.0, 4 * 40.0
    assert abs(d - a * 1.5 / per) < 1e-5


def test_dbnet_decode_box_recovery():
    """End-to-end: a rendered rectangle probability map decodes to one box
    whose min-rect closely covers the (unclipped) region."""
    from simpleaicv_tpu.data.text_detection import DBNetDecoder
    prob = np.zeros((1, 128, 128, 2), np.float32)
    prob[0, 40:60, 20:100, 0] = 1.0
    boxes, scores = DBNetDecoder()(prob)[0]
    assert len(boxes) == 1
    box = boxes[0]
    # line text -> 4-point box containing the original region
    assert box.shape == (4, 2)
    xs, ys = box[:, 0], box[:, 1]
    assert xs.min() <= 20 and xs.max() >= 99
    assert ys.min() <= 40 and ys.max() >= 59


def test_final_char_table_frozen():
    """Char table is deterministic, duplicate-free, covers the reference's
    composition (digits/letters/symbols/CJK) and never depends on data."""
    from simpleaicv_tpu.data.char_table import final_char_table
    t = final_char_table()
    assert t[:10] == list("0123456789")
    assert t[10:36] == list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    assert len(t) == len(set(t))
    assert "一" in t and "的" in t and "㑇" in t  # URO + Ext-A coverage
    assert len(t) == 27940
    # supplementary-plane CJK block (reference table chars beyond U+FFFF)
    assert "\U00020164" in t and "\U0002CE93" in t
    assert t == final_char_table()  # stable
    # true superset of the reference's curated 12,111-char asset
    import importlib.util
    ref_path = ("/root/reference/simpleAICV/text_recognition/char_sets/"
                "final_char_table.py")
    import os
    if os.path.exists(ref_path):
        spec = importlib.util.spec_from_file_location("ref_tab", ref_path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        ours = set(t)
        assert all(c in ours for c in m.final_char_table)


def test_reference_char_table_index_exact():
    """reference_char_table round-trips the reference asset 1:1
    (index-exact), making reference text-recognition checkpoints
    weight-convert compatible (12,111 classes + blank)."""
    from simpleaicv_tpu.data.char_table import reference_char_table
    ours = reference_char_table()
    assert len(ours) == 12111
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_final_char_table",
        "/root/reference/simpleAICV/text_recognition/char_sets/"
        "final_char_table.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert ours == list(m.final_char_table)

    from simpleaicv_tpu.data.text_recognition import CTCTextLabelConverter
    conv = CTCTextLabelConverter("reference")
    assert conv.num_classes == 12112
    assert conv.char_to_idx["0"] == 1
