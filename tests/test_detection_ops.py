"""Detection op golden tests: on-device NMS vs a literal numpy restatement of
the reference's greedy NMS (simpleAICV/detection/decode.py:44-106), IoU vs
torch-style formulas, and anchor/assignment parity."""

import numpy as np
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.iou import iou_method
from simpleaicv_tpu.ops.nms import nms_keep_mask, batched_nms
from simpleaicv_tpu.models.detection.anchor import RetinaAnchors, FCOSPositions
from simpleaicv_tpu.losses.detection import RetinaLoss, FCOSLoss


def ref_greedy_nms(sorted_bboxes, sorted_scores, thr):
    """Literal restatement of reference python_nms (decode.py:44-106)."""
    wh = sorted_bboxes[:, 2:4] - sorted_bboxes[:, 0:2]
    areas = np.maximum(wh[:, 0] * wh[:, 1], 0)
    indexes = np.arange(sorted_scores.shape[0], dtype=np.int32)
    keep = []
    while indexes.shape[0] > 0:
        keep_idx = indexes[0]
        keep.append(keep_idx)
        indexes = indexes[1:]
        if len(indexes) == 0:
            break
        tl = np.maximum(sorted_bboxes[keep_idx, 0:2],
                        sorted_bboxes[indexes, 0:2])
        br = np.minimum(sorted_bboxes[keep_idx, 2:4],
                        sorted_bboxes[indexes, 2:4])
        osz = np.maximum(br - tl, 0)
        overlap = osz[:, 0] * osz[:, 1]
        union = np.maximum(areas[keep_idx] + areas[indexes] - overlap, 1e-4)
        ious = overlap / union
        indexes = indexes[np.where(ious < thr)[0]]
    return np.array(keep)


def test_nms_matches_reference_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        ctr = rng.uniform(20, 200, (n, 2))
        wh = rng.uniform(10, 80, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(
            np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        ref_keep = ref_greedy_nms(boxes[order], scores[order], 0.5)
        ref_keep_orig = set(order[ref_keep])

        keep_mask = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                             jnp.asarray(scores), 0.5))
        ours = set(np.where(keep_mask)[0])
        assert ours == ref_keep_orig, (trial, ours, ref_keep_orig)


def test_batched_nms_output_contract():
    boxes = np.array([[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]],
                     np.float32)
    scores = np.array([[0.9, 0.8, 0.7]], np.float32)
    s, idx, valid = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                max_output=5, iou_threshold=0.5)
    s, idx = np.asarray(s), np.asarray(idx)
    assert (s[0][:2] > 0).all() and s[0][2] == -1  # 2 kept, padded with -1
    assert set(idx[0][:2]) == {0, 2}


def test_iou_types_finite_and_bounded():
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 100, (16, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (16, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    for t in ("IoU", "GIoU", "DIoU", "CIoU", "EIoU"):
        v = np.asarray(iou_method(jnp.asarray(a), jnp.asarray(b), iou_type=t))
        assert np.isfinite(v).all()
        assert (v <= 1.0 + 1e-5).all()


def test_retina_anchor_shapes():
    anchors = RetinaAnchors()
    sizes = [[80, 80], [40, 40], [20, 20], [10, 10], [5, 5]]
    levels = anchors(sizes)
    assert levels[0].shape == (80, 80, 9, 4)
    assert levels[4].shape == (5, 5, 9, 4)
    flat = anchors.flat_anchors(sizes)
    assert flat.shape == (sum(h * w * 9 for w, h in sizes), 4)
    # centers of the first stride-8 anchor cell are at 4,4
    first_ctr = (flat[4][:2] + flat[4][2:]) / 2  # ratio=1,scale=1 anchor
    np.testing.assert_allclose(first_ctr, [4.0, 4.0], atol=1e-4)


def test_retina_assignment_rules():
    loss = RetinaLoss()
    anchors = jnp.asarray(
        np.array([[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 11],
                  [55, 55, 60, 60]], np.float32))
    ann = np.full((1, 3, 5), -1.0, np.float32)
    ann[0, 0] = [0, 0, 10, 10, 3]  # exact match with anchor 0 (iou 1)
    gt_boxes, gt_cls = loss._assign(anchors, jnp.asarray(ann))
    gt_cls = np.asarray(gt_cls)[0]
    assert gt_cls[0] == 4.0       # class 3 -> 3+1
    assert gt_cls[1] == 0.0       # iou 0 -> background
    assert gt_cls[3] == 0.0
    # anchor 2: iou with gt = (9*10)/(10*10+9*11-90)=90/109=0.826 -> positive
    assert gt_cls[2] == 4.0

    # empty image: all ignore
    empty = np.full((1, 3, 5), -1.0, np.float32)
    _, cls2 = loss._assign(anchors, jnp.asarray(empty))
    assert (np.asarray(cls2) == -1.0).all()


def test_fcos_assignment_rules():
    loss = FCOSLoss(strides=(8,), mi=((-1, 64),))
    points = jnp.asarray(np.array([[12.0, 12.0], [100.0, 100.0]], np.float32))
    strides = jnp.asarray(np.array([8.0, 8.0], np.float32))
    mi = jnp.asarray(np.array([[-1, 64], [-1, 64]], np.float32))
    ann = np.full((1, 2, 5), -1.0, np.float32)
    ann[0, 0] = [4, 4, 28, 28, 5]   # point (12,12) inside, ctr (16,16)
    ltrb, cls, cn = loss._assign(points, strides, mi, jnp.asarray(ann))
    cls = np.asarray(cls)[0]
    assert cls[0] == 6.0  # class 5 + 1
    assert cls[1] == 0.0
    ltrb = np.asarray(ltrb)[0, 0]
    np.testing.assert_allclose(ltrb, [8, 8, 16, 16], atol=1e-5)
    # centerness = sqrt((8/16)*(8/16)) = 0.5
    np.testing.assert_allclose(np.asarray(cn)[0, 0], 0.5, atol=1e-5)
