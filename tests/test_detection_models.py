"""Detection model + loss + decode integration on small shapes, plus a short
end-to-end training-improves check on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.evaluation.coco_eval import CocoMAPEvaluator


@pytest.fixture(scope="module")
def retina_setup():
    model = MODELS.create("resnet18_retinanet", num_classes=8)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    return model, variables, x


def test_retinanet_shapes(retina_setup):
    model, variables, x = retina_setup
    cls_heads, reg_heads = model.apply(variables, x, False)
    assert len(cls_heads) == 5
    assert cls_heads[0].shape == (2, 16, 16, 9, 8)   # stride 8
    assert reg_heads[4].shape == (2, 1, 1, 9, 4)     # stride 128
    # sigmoid outputs with prior bias ~0.01
    assert 0.0 < float(jnp.mean(cls_heads[0])) < 0.1


def test_retina_loss_and_decode(retina_setup):
    model, variables, x = retina_setup
    outs = model.apply(variables, x, False)
    ann = np.full((2, 10, 5), -1.0, np.float32)
    ann[0, 0] = [10, 10, 60, 60, 2]
    ann[1, 0] = [30, 30, 100, 100, 5]
    loss = LOSSES.create("RetinaLoss")(outs, jnp.asarray(ann))
    assert np.isfinite(float(loss["cls_loss"]))
    assert np.isfinite(float(loss["reg_loss"]))

    decoder = DECODERS.create("RetinaDecoder", topn=200, max_object_num=20)
    scores, classes, boxes = decoder(outs)
    assert scores.shape == (2, 20) and boxes.shape == (2, 20, 4)


def test_fcos_shapes_loss_decode():
    model = MODELS.create("resnet18_fcos", num_classes=8)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    cls_heads, reg_heads, cnt_heads = model.apply(variables, x, False)
    assert cls_heads[0].shape == (2, 16, 16, 8)
    assert cnt_heads[0].shape == (2, 16, 16, 1)

    ann = np.full((2, 10, 5), -1.0, np.float32)
    ann[0, 0] = [10, 10, 60, 60, 2]
    loss = LOSSES.create("FCOSLoss")((cls_heads, reg_heads, cnt_heads),
                                     jnp.asarray(ann))
    for v in loss.values():
        assert np.isfinite(float(v))

    decoder = DECODERS.create("FCOSDecoder", topn=200, max_object_num=20)
    scores, classes, boxes = decoder((cls_heads, reg_heads, cnt_heads))
    assert scores.shape == (2, 20)


def test_coco_map_perfect_predictions():
    ev = CocoMAPEvaluator(num_classes=3)
    rng = np.random.RandomState(0)
    for _ in range(4):
        gts = rng.uniform(0, 100, (3, 2))
        boxes = np.concatenate([gts, gts + rng.uniform(40, 80, (3, 2))], 1)
        classes = np.array([0, 1, 2])
        ev.add_image(boxes, np.array([0.9, 0.8, 0.7]), classes, boxes,
                     classes)
    stats = ev.compute()
    assert stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"] == pytest.approx(
        1.0, abs=1e-6)


def test_coco_map_half_missed():
    ev = CocoMAPEvaluator(num_classes=1)
    gt = np.array([[0, 0, 50, 50], [100, 100, 160, 160]], np.float32)
    det = np.array([[0, 0, 50, 50]], np.float32)  # only first found
    ev.add_image(det, np.array([0.9]), np.array([0]), gt, np.array([0, 0]))
    stats = ev.compute()
    # recall limited to 0.5, precision 1 up to that recall
    ap = stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"]
    assert 0.4 < ap < 0.6


def test_coco_match_vectorized_equals_loop():
    """The vectorized greedy matcher must equal a literal restatement of
    COCOeval's per-(threshold, det, gt) scan (the ignore-sorted break rule)."""
    from simpleaicv_tpu.evaluation.coco_eval import (AREA_RANGES, IOU_THRS,
                                                     _box_iou)

    def loop_match(dets, det_scores, gts, area_rng, max_dets=100):
        T = len(IOU_THRS)
        gt_area = np.clip(gts[:, 2] - gts[:, 0], 0, None) * np.clip(
            gts[:, 3] - gts[:, 1], 0, None)
        gt_ignore = (gt_area < area_rng[0]) | (gt_area > area_rng[1])
        gt_order = np.argsort(gt_ignore, kind="stable")
        gts, gt_ignore = gts[gt_order], gt_ignore[gt_order]
        order = np.argsort(-det_scores, kind="stable")[:max_dets]
        dets = dets[order]
        D, G = dets.shape[0], gts.shape[0]
        ious = _box_iou(dets, gts)
        tp = np.zeros((T, D), bool)
        det_ig = np.zeros((T, D), bool)
        for t, thr in enumerate(IOU_THRS):
            gt_matched = np.zeros(G, bool)
            for d in range(D):
                best_iou = min(thr, 1 - 1e-10)
                best_g = -1
                for g in range(G):
                    if gt_matched[g]:
                        continue
                    if best_g > -1 and not gt_ignore[best_g] and gt_ignore[g]:
                        break
                    if ious[d, g] < best_iou:
                        continue
                    best_iou = ious[d, g]
                    best_g = g
                if best_g >= 0:
                    gt_matched[best_g] = True
                    if gt_ignore[best_g]:
                        det_ig[t, d] = True
                    else:
                        tp[t, d] = True
        det_area = np.clip(dets[:, 2] - dets[:, 0], 0, None) * np.clip(
            dets[:, 3] - dets[:, 1], 0, None)
        oor = (det_area < area_rng[0]) | (det_area > area_rng[1])
        for t in range(T):
            det_ig[t] |= (~tp[t]) & oor
        return tp, det_ig

    rng = np.random.RandomState(7)
    ev = CocoMAPEvaluator(num_classes=1)
    for area_rng in AREA_RANGES.values():
        for _ in range(20):
            ng, nd = rng.randint(0, 12), rng.randint(0, 30)
            gx = rng.uniform(0, 200, (ng, 2))
            gts = np.concatenate(
                [gx, gx + rng.uniform(2, 150, (ng, 2))], 1).astype(np.float32)
            # half the dets perturb real gts, half are random
            dx = rng.uniform(0, 200, (nd, 2))
            dets = np.concatenate(
                [dx, dx + rng.uniform(2, 150, (nd, 2))], 1).astype(np.float32)
            if ng and nd:
                take = rng.randint(0, ng, nd // 2)
                dets[:nd // 2] = gts[take] + rng.uniform(
                    -8, 8, (nd // 2, 4)).astype(np.float32)
            scores = rng.uniform(0, 1, nd).astype(np.float32)
            tp_v, ig_v, _, _ = ev._match_one(dets, scores, gts, area_rng)
            tp_l, ig_l = loop_match(dets, scores, gts, area_rng)
            np.testing.assert_array_equal(tp_v, tp_l)
            np.testing.assert_array_equal(ig_v, ig_l)


def test_coco_segm_map_perfect_and_partial():
    """Mask mAP (iou_type='segm'): perfect masks -> 1.0; a detection with
    a half-overlapping mask only counts at low IoU thresholds."""
    rng = np.random.RandomState(0)
    ev = CocoMAPEvaluator(num_classes=2, iou_type="segm")
    for _ in range(3):
        gt = np.zeros((2, 32, 32), np.uint8)
        gt[0, 4:16, 4:16] = 1
        gt[1, 18:30, 18:30] = 1
        ev.add_image(det_scores=np.array([0.9, 0.8]),
                     det_classes=np.array([0, 1]),
                     gt_classes=np.array([0, 1]),
                     det_masks=gt.copy(), gt_masks=gt)
    stats = ev.compute()
    assert stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"] == pytest.approx(
        1.0, abs=1e-6)

    ev = CocoMAPEvaluator(num_classes=1, iou_type="segm")
    gt = np.zeros((1, 32, 32), np.uint8)
    gt[0, 0:16, 0:16] = 1
    det = np.zeros((1, 32, 32), np.uint8)
    det[0, 0:16, 0:8] = 1  # IoU = 0.5 exactly
    ev.add_image(det_scores=np.array([0.9]), det_classes=np.array([0]),
                 gt_classes=np.array([0]), det_masks=det, gt_masks=gt)
    stats = ev.compute()
    # matches at IoU 0.5 only -> AP = 1/10 of thresholds
    assert stats["IoU=0.5,area=all,maxDets=100,mAP"] == pytest.approx(1.0)
    assert stats["IoU=0.75,area=all,maxDets=100,mAP"] == pytest.approx(0.0)
    assert stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"] == pytest.approx(
        0.1, abs=1e-6)
