"""Segmentation: loss golden tests vs torch restatements of the reference
formulas, model shapes, mIoU evaluator sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import LOSSES, MODELS
from simpleaicv_tpu.tasks.semantic_segmentation import (make_eval_fn,
                                                        make_evaluate)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    pred = rng.randn(2, 8, 8, 5).astype(np.float32)
    label = rng.randint(0, 5, (2, 8, 8)).astype(np.int32)
    label[0, :2, :2] = 255  # ignored region
    return pred, label


def _torch_ce(pred, label, ignore=255):
    p = torch.softmax(torch.tensor(pred.reshape(-1, 5)), -1).clamp(
        1e-4, 1 - 1e-4)
    lab = torch.tensor(label.reshape(-1).astype(np.int64))
    keep = (lab >= 0) & (lab != ignore)
    p, lab = p[keep], lab[keep]
    oh = F.one_hot(lab, 5).float()
    return float(((-torch.log(p)) * oh).sum(-1).mean())


def test_seg_ce_matches(data):
    pred, label = data
    ours = float(LOSSES.create("SegCELoss", ignore_index=255)(
        jnp.asarray(pred), jnp.asarray(label)))
    assert abs(ours - _torch_ce(pred, label)) < 1e-5


def test_seg_dice_iou_bce_finite(data):
    pred, label = data
    for name in ("SegMultiClassBCELoss", "SegIoULoss", "SegDiceLoss",
                 "SegLovaszLoss"):
        v = float(LOSSES.create(name, ignore_index=255)(
            jnp.asarray(pred), jnp.asarray(label)))
        assert np.isfinite(v) and v >= 0.0, name


def test_lovasz_matches_reference_filtered(data):
    """Masked lovasz == reference filtered lovasz (restated in numpy)."""
    pred, label = data
    ours = float(LOSSES.create("SegLovaszLoss", ignore_index=255)(
        jnp.asarray(pred), jnp.asarray(label)))

    p = 1 / (1 + np.exp(-pred.reshape(-1, 5)))
    p = np.clip(p, 1e-4, 1 - 1e-4)
    lab = label.reshape(-1)
    keep = (lab >= 0) & (lab != 255)
    p, lab = p[keep], lab[keep]
    total, count = 0.0, 0
    for ci in range(1, 5):
        m = (lab == ci).astype(np.float32)
        if m.sum() == 0:
            continue
        count += 1
        errors = np.abs(m - p[:, ci])
        order = np.argsort(-errors, kind="stable")
        es, ms = errors[order], m[order]
        gts = ms.sum()
        inter = gts - np.cumsum(ms)
        union = gts + np.cumsum(1 - ms)
        jac = 1 - inter / np.maximum(union, 1e-4)
        grad = np.concatenate([jac[:1], jac[1:] - jac[:-1]])
        total += float(np.dot(es, grad))
    ref = total / max(count, 1)
    assert abs(ours - ref) < 1e-4


def test_deeplab_shapes():
    model = MODELS.create("resnet18_deeplabv3plus", num_classes=7)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 64, 64, 7)


def test_miou_evaluator_perfect():
    model = MODELS.create("resnet18_deeplabv3plus", num_classes=4)
    # fabricate eval where pred==mask by monkey evaluation: use eval_fn math
    # directly with identity logits
    class Identity:
        def apply(self, variables, images, train):
            return jax.nn.one_hot(jnp.asarray(images[..., 0], jnp.int32), 4)

    eval_fn = make_eval_fn(Identity(), num_classes=4, ignore_index=255)
    mask = np.random.RandomState(0).randint(0, 4, (2, 8, 8)).astype(np.int32)
    batch = {"image": mask[..., None].astype(np.float32).repeat(3, -1),
             "mask": mask}
    m = eval_fn(None, {}, {"image": jnp.asarray(batch["image"]),
                           "mask": jnp.asarray(batch["mask"])}, None, False)
    evaluate = make_evaluate(4, 255)
    stats = evaluate(lambda *a: m, None, {}, [batch], lambda b: b)
    assert stats["mean_iou"] == pytest.approx(100.0)
