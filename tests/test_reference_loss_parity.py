"""Loss parity against the reference's ACTUAL loss implementations.

Shared fixture preds/annotations go through both frameworks' loss stacks;
scalars must agree.  This pins the full train-step math (assignment,
matching, focal/IoU/centerness terms) to the reference, not to our own torch
restatements.  Reference: simpleAICV/detection/losses.py.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from tests._reference import ref_module, seed_all, torch


def _levels(hw, strides=(8, 16, 32, 64, 128)):
    return [(int(np.ceil(hw / s)), int(np.ceil(hw / s))) for s in strides]


def _annotations(rng, b, m, hw, num_classes):
    """[B,M,5] x1y1x2y2,cls; -1 padded. Guarantees >=1 valid gt in image 0."""
    ann = -np.ones((b, m, 5), np.float32)
    for i in range(b):
        n = rng.randint(1 if i == 0 else 0, m + 1)
        for j in range(n):
            x1, y1 = rng.rand(2) * (hw * 0.6)
            w, h = rng.rand(2) * (hw * 0.35) + 8
            ann[i, j] = [x1, y1, min(x1 + w, hw - 1), min(y1 + h, hw - 1),
                         rng.randint(num_classes)]
    return ann


def test_fcos_loss_parity():
    ref = ref_module("simpleAICV.detection.losses")
    seed_all(0)
    rng = np.random.RandomState(21)
    hw, b, c = 160, 2, 20
    cls_p, reg_p, cnt_p = [], [], []
    for (fh, fw) in _levels(hw):
        cls_p.append(1.0 / (1.0 + np.exp(-rng.randn(b, fh, fw, c)
                                         .astype(np.float32))))
        reg_p.append(rng.randn(b, fh, fw, 4).astype(np.float32))
        cnt_p.append(1.0 / (1.0 + np.exp(-rng.randn(b, fh, fw, 1)
                                         .astype(np.float32))))
    ann = _annotations(rng, b, 6, hw, c)

    tl = ref.FCOSLoss()
    with torch.no_grad():
        ld_ref = tl([[torch.from_numpy(p) for p in cls_p],
                     [torch.from_numpy(p) for p in reg_p],
                     [torch.from_numpy(p) for p in cnt_p]],
                    torch.from_numpy(ann))

    from simpleaicv_tpu.losses.detection import FCOSLoss
    ml = FCOSLoss()
    ld = ml(([jnp.asarray(p) for p in cls_p],
             [jnp.asarray(p) for p in reg_p],
             [jnp.asarray(p) for p in cnt_p]), jnp.asarray(ann))

    for k in ("cls_loss", "reg_loss", "center_ness_loss"):
        ours, theirs = float(ld[k]), float(ld_ref[k])
        assert abs(ours - theirs) < 5e-4 * max(1.0, abs(theirs)), \
            f"{k}: ours {ours} vs reference {theirs}"


def test_retina_loss_parity():
    ref = ref_module("simpleAICV.detection.losses")
    seed_all(0)
    rng = np.random.RandomState(22)
    hw, b, c, a = 160, 2, 20, 9
    cls_p, reg_p = [], []
    for (fh, fw) in _levels(hw):
        cls_p.append(1.0 / (1.0 + np.exp(-rng.randn(b, fh, fw, a, c)
                                         .astype(np.float32))))
        reg_p.append(rng.randn(b, fh, fw, a, 4).astype(np.float32) * 0.2)
    ann = _annotations(rng, b, 6, hw, c)

    tl = ref.RetinaLoss()
    with torch.no_grad():
        ld_ref = tl([[torch.from_numpy(p) for p in cls_p],
                     [torch.from_numpy(p) for p in reg_p]],
                    torch.from_numpy(ann))

    from simpleaicv_tpu.losses.detection import RetinaLoss
    ml = RetinaLoss()
    ld = ml(([jnp.asarray(p) for p in cls_p],
             [jnp.asarray(p) for p in reg_p]), jnp.asarray(ann))

    for k in ("cls_loss", "reg_loss"):
        ours, theirs = float(ld[k]), float(ld_ref[k])
        assert abs(ours - theirs) < 1e-3 * max(1.0, abs(theirs)), \
            f"{k}: ours {ours} vs reference {theirs}"


def test_detr_loss_parity():
    ref = ref_module("simpleAICV.detection.losses")
    seed_all(0)
    rng = np.random.RandomState(23)
    b, q, c, layers = 2, 20, 8, 3
    cls_p = rng.randn(layers, b, q, c + 1).astype(np.float32)
    reg_p = 1.0 / (1.0 + np.exp(-rng.randn(layers, b, q, 4)
                                .astype(np.float32)))
    ann = _annotations(rng, b, 4, 128, c)

    tl = ref.DETRLoss(num_classes=c)
    with torch.no_grad():
        ld_ref = tl([torch.from_numpy(cls_p), torch.from_numpy(reg_p)],
                    torch.from_numpy(ann))

    from simpleaicv_tpu.losses.detr import DETRLoss
    ml = DETRLoss(num_classes=c)
    ld = ml((jnp.asarray(cls_p), jnp.asarray(reg_p)), jnp.asarray(ann))

    ref_keys = sorted(k for k in ld_ref)
    our_keys = sorted(k for k in ld)
    assert ref_keys == our_keys, (ref_keys, our_keys)
    for k in ref_keys:
        ours, theirs = float(ld[k]), float(ld_ref[k])
        assert abs(ours - theirs) < 1e-3 * max(1.0, abs(theirs)), \
            f"{k}: ours {ours} vs reference {theirs}"


def test_dbnet_loss_parity():
    ref = ref_module("simpleAICV.text_detection.losses")
    seed_all(0)
    rng = np.random.RandomState(24)
    b, h, w = 2, 64, 64
    prob = 1.0 / (1.0 + np.exp(-rng.randn(b, h, w).astype(np.float32)))
    thr = 1.0 / (1.0 + np.exp(-rng.randn(b, h, w).astype(np.float32)))
    shapes_np = {
        "probability_mask": (rng.rand(b, h, w) > 0.8).astype(np.float32),
        "probability_ignore_mask":
            (rng.rand(b, h, w) > 0.05).astype(np.float32),
        "threshold_mask": rng.rand(b, h, w).astype(np.float32) * 0.4 + 0.3,
        "threshold_ignore_mask":
            (rng.rand(b, h, w) > 0.5).astype(np.float32),
    }

    tl = ref.DBNetLoss()
    with torch.no_grad():
        preds_t = torch.from_numpy(np.stack([prob, thr], axis=1))
        ld_ref = tl(preds_t, {k: torch.from_numpy(v)
                              for k, v in shapes_np.items()})

    from simpleaicv_tpu.losses.text_detection import DBNetLoss
    ml = DBNetLoss()
    ld = ml(jnp.asarray(np.stack([prob, thr], axis=-1)),
            {k: jnp.asarray(v) for k, v in shapes_np.items()})
    for k in ("probability_map_loss", "threshold_map_loss",
              "binary_map_loss"):
        ours, theirs = float(ld[k]), float(ld_ref[k])
        assert abs(ours - theirs) < 1e-3 * max(1.0, abs(theirs)), \
            f"{k}: ours {ours} vs reference {theirs}"


@pytest.mark.parametrize("name", ["CELoss", "MultiClassBCELoss", "IoULoss",
                                  "DiceLoss", "LovaszLoss"])
def test_semantic_segmentation_loss_parity(name):
    ref = ref_module("simpleAICV.semantic_segmentation.losses")
    seed_all(0)
    rng = np.random.RandomState(25)
    b, h, w, c = 2, 32, 32, 7
    logits = rng.randn(b, h, w, c).astype(np.float32)
    label = rng.randint(0, c, (b, h, w)).astype(np.float32)
    label[0, :4] = 255  # ignore region

    tl = getattr(ref, name)(ignore_index=255)
    with torch.no_grad():
        theirs = float(tl(torch.from_numpy(
            logits.transpose(0, 3, 1, 2)), torch.from_numpy(label)))

    from simpleaicv_tpu.core.registry import LOSSES
    ml = LOSSES.create(f"Seg{name}", ignore_index=255)
    ours = float(ml(jnp.asarray(logits), jnp.asarray(label)))
    assert abs(ours - theirs) < 2e-3 * max(1.0, abs(theirs)), \
        f"{name}: ours {ours} vs reference {theirs}"
