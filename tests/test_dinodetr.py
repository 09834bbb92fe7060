"""DINO-DETR: forward shapes (train with denoising + eval), loss finiteness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.losses.dinodetr import DINODETRLoss


@pytest.fixture(scope="module")
def tiny_dino():
    model = MODELS.create(
        "resnet18_dinodetr", num_classes=8, query_nums=20,
        encoder_layer_nums=1, decoder_layer_nums=2, hidden_inplanes=64,
        feedforward_planes=128, dn_number=6)
    x = jnp.zeros((2, 128, 128, 3))
    ann = np.full((2, 3, 5), -1.0, np.float32)
    ann[0, 0] = [0.5, 0.5, 0.2, 0.2, 3]
    ann[1, 0] = [0.3, 0.3, 0.1, 0.2, 1]
    ann[1, 1] = [0.7, 0.6, 0.2, 0.1, 5]
    ann = jnp.asarray(ann)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dn": jax.random.PRNGKey(1)}, x, ann, True)
    return model, variables, x, ann


def test_dino_train_forward_with_dn(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs, _ = model.apply(variables, x, ann, True,
                          rngs={"dn": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    assert outs["pred_logits"].shape == (2, 20, 8)
    assert outs["pred_boxes"].shape == (2, 20, 4)
    assert outs["dn_pred_logits"].shape[2] == 2 * 6  # 2*dn_number slots
    assert outs["interm_pred_logits"].shape == (2, 20, 8)
    assert np.isfinite(np.asarray(outs["pred_boxes"])).all()


def test_dino_eval_forward(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs = model.apply(variables, x, None, False)
    assert "dn_pred_logits" not in outs
    assert outs["pred_logits"].shape == (2, 20, 8)


def test_dino_loss(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs, _ = model.apply(variables, x, ann, True,
                          rngs={"dn": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    loss = DINODETRLoss(num_classes=8)(outs, ann)
    assert "cls_loss" in loss and "dn_cls_loss" in loss and \
        "interm_cls_loss" in loss
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


@pytest.mark.parametrize("max_gt", [1, 40, 93])
def test_dn_dynamic_groups_at_scale(max_gt):
    """Scale stress (VERDICT r2 #9): the dn layout must reproduce the
    reference's dynamic group arithmetic (dinodetr.py:158-165:
    groups = dn_number // batch-max-GT, single_pad = batch-max-GT) at
    batch-max GT counts {1, 40, 93} — in particular every valid GT gets
    positive dn supervision in every group (the old static 5x20 tiling
    silently dropped GTs 21..93)."""
    dn_number = 100
    model = MODELS.create(
        "resnet18_dinodetr", num_classes=8, query_nums=12,
        encoder_layer_nums=1, decoder_layer_nums=1, hidden_inplanes=64,
        feedforward_planes=64, dn_number=dn_number)
    m_slots = 100  # collater max_annots_num
    ann = np.full((2, m_slots, 5), -1.0, np.float32)
    rng = np.random.RandomState(0)
    for j in range(max_gt):          # image 0: max_gt valid boxes
        cx, cy = rng.rand(2) * 0.8 + 0.1
        ann[0, j] = [cx, cy, 0.1, 0.1, rng.randint(8)]
    ann[1, 0] = [0.5, 0.5, 0.2, 0.2, 1]  # image 1: a single gt
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dn": jax.random.PRNGKey(1)}, x,
                           jnp.asarray(ann), True)
    outs, _ = model.apply(variables, x, jnp.asarray(ann), True,
                          rngs={"dn": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    meta = outs["dn_meta"]
    pad = meta["pad_size"]
    assert pad == 2 * dn_number                       # static slot budget
    groups = max(1, dn_number // max_gt)              # reference formula
    width = 2 * max_gt                                # 2 * single_pad
    valid = np.asarray(meta["dn_valid"])
    pos = np.asarray(meta["dn_is_positive"])
    gt_idx = np.asarray(meta["dn_gt_index"])

    # image 0: groups*width slots valid; every gt 0..max_gt-1 appears as a
    # positive exactly `groups` times
    assert valid[0].sum() == groups * width
    pos_idx = gt_idx[0][valid[0] & pos[0]]
    counts = np.bincount(pos_idx, minlength=max_gt)
    assert (counts[:max_gt] == groups).all()
    assert valid[0][:width][:max_gt].all()            # group 0 positives

    # image 1 (1 valid gt) shares the layout: only gt_idx==0 slots valid
    assert valid[1].sum() == groups * 2
    assert (gt_idx[1][valid[1]] == 0).all()

    # dn predictions carry one slot per budget entry
    assert outs["dn_pred_logits"].shape[2] == pad
