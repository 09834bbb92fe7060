"""DINO-DETR Hungarian matching golden: our cost construction + host matcher
vs a literal torch restatement of the reference's focal-style cost
(simpleAICV/detection/losses.py:1406-1462)."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.losses.dinodetr import DINODETRLoss

torch = pytest.importorskip("torch")
from scipy.optimize import linear_sum_assignment  # noqa: E402


def _xyxy(b):
    return torch.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                        b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)


def _giou(b1, b2):
    a1 = ((b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])).clamp(min=0)
    a2 = ((b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])).clamp(min=0)
    lt = torch.max(b1[:, None, :2], b2[:, :2])
    rb = torch.min(b1[:, None, 2:], b2[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = (wh[..., 0] * wh[..., 1]).clamp(min=0)
    union = (a1[:, None] + a2 - inter).clamp(min=1e-4)
    iou = inter / union
    elt = torch.min(b1[:, None, :2], b2[:, :2])
    erb = torch.max(b1[:, None, 2:], b2[:, 2:])
    ewh = (erb - elt).clamp(min=0)
    earea = (ewh[..., 0] * ewh[..., 1]).clamp(min=1e-4)
    return iou - (earea - union) / earea


def test_dinodetr_matching_matches_reference():
    rng = np.random.RandomState(0)
    b, q, nc = 3, 60, 8
    alpha, gamma = 0.25, 2.0
    cls = rng.randn(b, q, nc).astype(np.float32) * 2
    reg = 1 / (1 + np.exp(-rng.randn(b, q, 4))).astype(np.float32)
    annots = np.full((b, 6, 5), -1.0, np.float32)
    annots[0, 0] = [0.3, 0.3, 0.2, 0.2, 2]
    annots[0, 1] = [0.6, 0.7, 0.3, 0.2, 4]
    annots[1, 0] = [0.5, 0.5, 0.4, 0.4, 1]
    annots[2, 0] = [0.2, 0.2, 0.15, 0.3, 7]
    annots[2, 1] = [0.7, 0.4, 0.2, 0.2, 0]
    annots[2, 2] = [0.4, 0.6, 0.3, 0.3, 3]

    loss = DINODETRLoss(num_classes=nc)
    ours = np.asarray(loss._match(jnp.asarray(cls), jnp.asarray(reg),
                                  jnp.asarray(annots)))

    # torch restatement
    p = torch.clamp(torch.sigmoid(torch.tensor(cls)), 1e-4, 1 - 1e-4)
    r = torch.clamp(torch.tensor(reg), 1e-4, 1 - 1e-4)
    neg = (1 - alpha) * (p**gamma) * (-torch.log(1 - p + 1e-4))
    pos = alpha * ((1 - p)**gamma) * (-torch.log(p + 1e-4))
    for i in range(b):
        ann = torch.tensor(annots[i])
        ann = ann[ann[:, 4] >= 0]
        labels = ann[:, 4].long()
        cls_cost = pos[i][:, labels] - neg[i][:, labels]
        box_cost = torch.cdist(r[i], ann[:, :4], p=1)
        giou_cost = -_giou(_xyxy(r[i]), _xyxy(ann[:, :4]))
        total = 2.0 * cls_cost + 5.0 * box_cost + 2.0 * giou_cost
        rows, cols = linear_sum_assignment(total.numpy())
        ref = np.full(q, -1)
        ref[rows] = cols
        np.testing.assert_array_equal(ours[i], ref)
