"""DCNv2, mosaic, anchor k-means, text-detection eval, tracing utils."""

import numpy as np
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.dcnv2 import DeformConv2d, deform_conv2d
from simpleaicv_tpu.data.mosaic import MosaicResizeDetection
from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.yolov3_anchor_cluster import kmeans_anchors
from simpleaicv_tpu.evaluation.text_eval import (evaluate_text_detection,
                                                 _poly_iou)


def test_dcnv2_zero_offsets_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    offsets = jnp.zeros((1, 8, 8, 18))
    mask = jnp.ones((1, 8, 8, 9))
    out = deform_conv2d(x, offsets, mask, kernel)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_dcnv2_module():
    x = jnp.zeros((1, 8, 8, 4))
    m = DeformConv2d(planes=6)
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert m.apply(v, x).shape == (1, 8, 8, 6)


def test_mosaic():
    ds = MosaicResizeDetection(FakeDetectionDataset(8, 128), resize=128,
                               mosaic_prob=1.0)
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    assert s["annots"].shape[1] == 5


def test_kmeans_anchors():
    rng = np.random.RandomState(0)
    wh = np.concatenate([rng.uniform(10, 20, (100, 2)),
                         rng.uniform(80, 120, (100, 2))])
    anchors, best = kmeans_anchors(wh, k=2, seed=0)
    assert anchors.shape == (2, 2)
    assert best > 0.7
    assert anchors[0, 0] < anchors[1, 0]  # sorted by area


def test_text_detection_eval():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    far = sq + 100
    res = [{"pred_polys": [sq, far], "gt_polys": [sq],
            "gt_ignore": [False]}]
    out = evaluate_text_detection(res)
    assert out["precision"] == 50.0 and out["recall"] == 100.0
    assert _poly_iou(sq, sq) > 0.9
