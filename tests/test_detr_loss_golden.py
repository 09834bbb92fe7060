"""DETRLoss end-to-end golden test vs a literal torch restatement of the
reference (simpleAICV/detection/losses.py:836-1083): last-layer Hungarian
matching shared across decoder layers, weighted-mean CE with background
weight 0.1, L1 + GIoU normalized by total valid gt count."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.losses.detr import DETRLoss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402


def _cxcywh_to_xyxy_t(b):
    return torch.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                        b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)


def _giou_t(b1, b2):
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


def ref_detr_loss(cls_preds, reg_preds, annots, nc, no_obj_w=0.1):
    layers, b, q = cls_preds.shape[:3]
    cls_t = torch.tensor(cls_preds)
    reg_t = torch.clamp(torch.tensor(reg_preds), 1e-4, 1 - 1e-4)

    # last-layer matching (reference :1000-1083)
    indices = []
    probs = F.softmax(cls_t[-1], -1)
    for i in range(b):
        ann = torch.tensor(annots[i])
        ann = ann[ann[:, 4] >= 0]
        if ann.shape[0] == 0:
            indices.append((np.zeros(0, int), np.zeros(0, int)))
            continue
        tgt_cls = ann[:, 4].long()
        cls_cost = -probs[i][:, tgt_cls]
        l1_cost = torch.cdist(reg_t[-1, i], ann[:, :4], p=1)
        giou_cost = -_giou_t(_cxcywh_to_xyxy_t(reg_t[-1, i]),
                             _cxcywh_to_xyxy_t(ann[:, :4]))
        cost = 1.0 * cls_cost + 5.0 * l1_cost + 2.0 * giou_cost
        rows, cols = linear_sum_assignment(cost.numpy())
        indices.append((rows, cols))

    total_gt = max(sum((annots[i][:, 4] >= 0).sum() for i in range(b)), 1)
    out = {}
    for layer in range(layers):
        tgt = torch.full((b, q), nc).long()
        for i, (rows, cols) in enumerate(indices):
            ann = torch.tensor(annots[i])
            ann = ann[ann[:, 4] >= 0]
            if len(rows):
                tgt[i, rows] = ann[cols, 4].long()
        w = torch.ones(nc + 1)
        w[-1] = no_obj_w
        cls_loss = F.cross_entropy(cls_t[layer].transpose(1, 2), tgt, w)

        matched_pred, matched_gt = [], []
        for i, (rows, cols) in enumerate(indices):
            ann = torch.tensor(annots[i])
            ann = ann[ann[:, 4] >= 0]
            if len(rows):
                matched_pred.append(reg_t[layer, i, rows])
                matched_gt.append(ann[cols, :4])
        mp = torch.cat(matched_pred)
        mg = torch.cat(matched_gt)
        l1 = F.l1_loss(mp, mg, reduction="none").sum() / total_gt
        giou = 1 - torch.diag(_giou_t(_cxcywh_to_xyxy_t(mp),
                                      _cxcywh_to_xyxy_t(mg)))
        out[f"layer_{layer}_cls_loss"] = float(cls_loss)
        out[f"layer_{layer}_box_l1_loss"] = 5.0 * float(l1)
        out[f"layer_{layer}_box_iou_loss"] = 2.0 * float(giou.sum() / total_gt)
    return out


def test_detr_loss_matches_reference():
    rng = np.random.RandomState(0)
    layers, b, q, nc = 3, 2, 40, 6
    cls = rng.randn(layers, b, q, nc + 1).astype(np.float32)
    reg = 1 / (1 + np.exp(-rng.randn(layers, b, q, 4))).astype(np.float32)
    annots = np.full((b, 5, 5), -1.0, np.float32)
    annots[0, 0] = [0.3, 0.3, 0.2, 0.2, 2]
    annots[0, 1] = [0.6, 0.7, 0.3, 0.2, 4]
    annots[1, 0] = [0.5, 0.5, 0.4, 0.4, 1]
    annots[1, 1] = [0.2, 0.8, 0.2, 0.3, 0]

    ours = DETRLoss(num_classes=nc)((jnp.asarray(cls), jnp.asarray(reg)),
                                    jnp.asarray(annots))
    ref = ref_detr_loss(cls, reg, annots, nc)
    for k in ref:
        assert abs(float(ours[k]) - ref[k]) < 2e-4 * max(abs(ref[k]), 1), \
            (k, float(ours[k]), ref[k])
