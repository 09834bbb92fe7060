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
