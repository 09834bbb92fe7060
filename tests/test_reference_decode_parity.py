"""Decoder cross-framework parity (VERDICT r3 ask #7).

Feeds IDENTICAL random head outputs to the reference's actual per-image
numpy decoders (/root/reference/simpleAICV/detection/decode.py:175-713
RetinaDecoder/FCOSDecoder/DETRDecoder/DINODETRDecoder and
/root/reference/simpleAICV/instance_segmentation/decode.py:339-650
SOLOV2Decoder, run on CPU torch) and to the repo's on-device fixed-shape
decoders, and asserts the final kept (scores, classes, boxes/masks) agree —
the box-transform / threshold / top-k / NMS plumbing that produces final
mAP, which round 3 left pinned only against the builder's own reading.

Fixture design: class scores are sparse (background ~0.02, a few dozen
boosted cells) so the candidate-pool fixed-shape stand-ins are exact and
score ties at NMS boundaries don't occur.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests._reference import ref_module, seed_all, torch

B = 2


def _to_torch(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _assert_triples(ours, theirs, box_atol=1e-3, name=""):
    o_scores, o_classes, o_boxes = [np.asarray(t) for t in ours]
    r_scores, r_classes, r_boxes = [np.asarray(t) for t in theirs]
    np.testing.assert_allclose(o_scores, r_scores, atol=2e-5,
                               err_msg=f"{name} scores")
    np.testing.assert_array_equal(o_classes.astype(np.int32),
                                  r_classes.astype(np.int32),
                                  err_msg=f"{name} classes")
    valid = r_scores > 0
    np.testing.assert_allclose(o_boxes[valid], r_boxes[valid], atol=box_atol,
                               err_msg=f"{name} boxes")


def _sparse_probs(rng, shape, n_boost, lo=0.3, hi=0.95):
    """background ~0.02 probabilities with n_boost boosted entries."""
    p = rng.rand(*shape).astype(np.float32) * 0.04
    flat = p.reshape(-1)
    n = min(n_boost, flat.size // 2)
    idx = rng.choice(flat.size, size=n, replace=False)
    flat[idx] = lo + rng.rand(n).astype(np.float32) * (hi - lo)
    return p


def test_retina_decoder_parity():
    """RetinaDecoder: anchor snap (txtytwth -> int-truncated xyxy), per-
    anchor argmax class, 0.05 threshold, top-1000, python NMS, 100-pad
    (reference detection/decode.py:175-271)."""
    ref_decode = ref_module("simpleAICV.detection.decode")
    seed_all(0)
    rng = np.random.RandomState(5)
    sizes = [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2)]
    num_classes, na = 12, 9
    cls_preds = [_sparse_probs(rng, (B, h, w, na, num_classes), 25)
                 for h, w in sizes]
    reg_preds = [(rng.randn(B, h, w, na, 4) * 0.3).astype(np.float32)
                 for h, w in sizes]

    ref = ref_decode.RetinaDecoder(nms_type="python_nms")(
        ([_to_torch(c) for c in cls_preds], [_to_torch(r) for r in reg_preds]))

    from simpleaicv_tpu.core.registry import DECODERS
    ours = DECODERS.create("RetinaDecoder", nms_type="python_nms")(
        (cls_preds, reg_preds))
    _assert_triples(ours, ref, box_atol=0.0, name="retina")


def test_fcos_decoder_parity():
    """FCOSDecoder: sqrt(cls*centerness) scores, ltrb exp snap, 0.6 NMS
    (reference detection/decode.py:274-366)."""
    ref_decode = ref_module("simpleAICV.detection.decode")
    rng = np.random.RandomState(6)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    num_classes = 9
    cls_preds = [_sparse_probs(rng, (B, h, w, num_classes), 20)
                 for h, w in sizes]
    reg_preds = [(rng.randn(B, h, w, 4).astype(np.float32) * 0.5 + 2.0)
                 for h, w in sizes]
    center_preds = [rng.rand(B, h, w, 1).astype(np.float32)
                    for h, w in sizes]

    ref = ref_decode.FCOSDecoder(nms_type="python_nms")(
        ([_to_torch(c) for c in cls_preds],
         [_to_torch(r) for r in reg_preds],
         [_to_torch(c) for c in center_preds]))

    from simpleaicv_tpu.core.registry import DECODERS
    ours = DECODERS.create("FCOSDecoder", nms_type="python_nms")(
        (cls_preds, reg_preds, center_preds))
    _assert_triples(ours, ref, box_atol=0.0, name="fcos")


def test_detr_decoder_parity():
    """DETRDecoder: last-layer softmax, no-object class drop, cxcywh *
    scaled size, no NMS (reference detection/decode.py:367-483)."""
    ref_decode = ref_module("simpleAICV.detection.decode")
    rng = np.random.RandomState(7)
    L, Q, C = 3, 50, 10  # C includes no-object
    cls_logits = rng.randn(L, B, Q, C + 1).astype(np.float32) * 2
    boxes = rng.rand(L, B, Q, 4).astype(np.float32) * 0.5 + 0.25
    scaled_sizes = [(160, 200), (120, 180)]

    ref = ref_decode.DETRDecoder(num_classes=C)(
        (_to_torch(cls_logits), _to_torch(boxes)), scaled_sizes)

    from simpleaicv_tpu.core.registry import DECODERS
    ours = DECODERS.create("DETRDecoder", num_classes=C)(
        (cls_logits, boxes), scaled_sizes)
    _assert_triples(ours, ref, box_atol=1e-3, name="detr")


def test_dinodetr_decoder_parity():
    """DINODETRDecoder: per-query sigmoid argmax, threshold, top-300,
    class-agnostic python NMS, top-100 (reference decode.py:486-713)."""
    ref_decode = ref_module("simpleAICV.detection.decode")
    rng = np.random.RandomState(8)
    Q, C = 120, 15
    logits = (rng.randn(B, Q, C) * 1.2 - 3.0).astype(np.float32)
    # boost some queries so real detections survive the 0.05 threshold
    for b in range(B):
        qi = rng.choice(Q, size=30, replace=False)
        logits[b, qi, rng.randint(0, C, 30)] += 4.5
    boxes = rng.rand(B, Q, 4).astype(np.float32) * 0.4 + 0.3
    scaled_sizes = [(96, 128), (128, 96)]

    ref = ref_decode.DINODETRDecoder()(
        {"pred_logits": _to_torch(logits), "pred_boxes": _to_torch(boxes)},
        scaled_sizes)

    from simpleaicv_tpu.core.registry import DECODERS
    ours = DECODERS.create("DINODETRDecoder", num_classes=C)(
        {"pred_logits": logits, "pred_boxes": boxes}, scaled_sizes)
    _assert_triples(ours, ref, box_atol=1e-3, name="dinodetr")


def test_solov2_decoder_parity():
    """SOLOV2Decoder: (cell,class) pair selection, dynamic-conv masks,
    stride filter, maskness, Matrix NMS, update/keep thresholds, x4
    align-corners upsample + re-threshold (reference
    instance_segmentation/decode.py:339-650)."""
    ref_decode = ref_module("simpleAICV.instance_segmentation.decode")
    rng = np.random.RandomState(9)
    grids = (12, 10, 8, 6, 4)
    strides = (8, 8, 16, 32, 32)
    C, K, h, w = 6, 16, 24, 24

    mask_feat = rng.randn(B, h, w, K).astype(np.float32)
    cate_logits, kernels = [], []
    for g in grids:
        lg = (rng.randn(B, g, g, C) * 1.0 - 4.0).astype(np.float32)
        for b in range(B):
            n = max(2, g // 2)
            ii = rng.randint(0, g, n)
            jj = rng.randint(0, g, n)
            lg[b, ii, jj, rng.randint(0, C, n)] += 5.0
        cate_logits.append(lg)
        kernels.append(rng.randn(B, g, g, K).astype(np.float32) * 0.6)

    ref = ref_decode.SOLOV2Decoder(
        strides=strides, grid_nums=grids)(
        (_to_torch(mask_feat.transpose(0, 3, 1, 2)),
         [_to_torch(k.transpose(0, 3, 1, 2)) for k in kernels],
         [_to_torch(c.transpose(0, 3, 1, 2)) for c in cate_logits]),
        scaled_sizes=[(4 * h, 4 * w)] * B,
        origin_sizes=[(4 * h, 4 * w)] * B)
    ref_masks, ref_labels, ref_scores = ref

    from simpleaicv_tpu.core.registry import DECODERS
    ours = DECODERS.create("SOLOV2Decoder", strides=strides, grid_nums=grids)(
        (mask_feat, kernels, cate_logits))
    o_masks, o_labels, o_scores = ours

    for i in range(B):
        n_ref = len(ref_scores[i])
        kept = o_scores[i] > 0
        assert int(kept.sum()) == n_ref, (i, int(kept.sum()), n_ref)
        if n_ref == 0:
            continue
        np.testing.assert_allclose(o_scores[i][:n_ref], ref_scores[i],
                                   atol=2e-5, err_msg=f"solov2 scores im{i}")
        np.testing.assert_array_equal(
            o_labels[i][:n_ref].astype(np.int64), ref_labels[i],
            err_msg=f"solov2 labels im{i}")
        om = o_masks[i][:n_ref].astype(np.uint8)
        rm = np.asarray(ref_masks[i], np.uint8)
        assert om.shape == rm.shape, (om.shape, rm.shape)
        # the x4 upsample runs through two different bilinear kernels; only
        # pixels whose soft value sits exactly at the 0.5 threshold can flip
        mismatch = np.mean(om != rm)
        assert mismatch < 2e-3, f"solov2 mask pixel mismatch {mismatch}"
