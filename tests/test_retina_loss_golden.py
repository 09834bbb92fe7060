"""RetinaLoss end-to-end golden test: our vectorized masked implementation vs
a literal torch restatement of the reference's per-image filtered computation
(simpleAICV/detection/losses.py:126-432) on random predictions/annotations."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.losses.detection import RetinaLoss
from simpleaicv_tpu.models.detection.anchor import RetinaAnchors

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def ref_retina_loss(cls_preds_np, reg_preds_np, anchors_np, annots_np,
                    alpha=0.25, gamma=2.0, beta=1.0 / 9.0):
    """Torch restatement of the reference (filtered, per-image)."""
    device = "cpu"
    b = annots_np.shape[0]
    anchors = torch.tensor(anchors_np)
    batch_anns = []
    for i in range(b):
        ann = torch.tensor(annots_np[i])
        ann = ann[ann[:, 4] >= 0]
        n_anchor = anchors.shape[0]
        if ann.shape[0] == 0:
            out = torch.ones(n_anchor, 5) * -1
        else:
            gt = ann[:, :4]
            cls = ann[:, 4]
            # iou
            lt = torch.max(anchors[:, None, :2], gt[None, :, :2])
            rb = torch.min(anchors[:, None, 2:], gt[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[..., 0] * wh[..., 1]
            a1 = ((anchors[:, 2:] - anchors[:, :2]).clamp(min=0)
                  .prod(-1))
            a2 = ((gt[:, 2:] - gt[:, :2]).clamp(min=0).prod(-1))
            union = (a1[:, None] + a2[None] - inter).clamp(min=1e-4)
            ious = inter / union
            overlap, idx = ious.max(1)
            assigned = torch.ones(n_anchor) * -1
            assigned[overlap < 0.4] = 0
            pos = overlap >= 0.5
            assigned[pos] = cls[idx][pos] + 1
            gtb = gt[idx]
            # txtytwth
            awh = anchors[:, 2:] - anchors[:, :2]
            actr = anchors[:, :2] + 0.5 * awh
            gwh = (gtb[:, 2:] - gtb[:, :2]).clamp(min=1e-4)
            gctr = gtb[:, :2] + 0.5 * gwh
            t = torch.cat([(gctr - actr) / awh, torch.log(gwh / awh)], 1)
            out = torch.cat([t, assigned[:, None]], 1)
        batch_anns.append(out)
    batch_anns = torch.stack(batch_anns).reshape(-1, 5)

    cls_preds = torch.tensor(cls_preds_np).reshape(-1, cls_preds_np.shape[-1])
    reg_preds = torch.tensor(reg_preds_np).reshape(-1, 4)
    cls_preds = torch.clamp(cls_preds, 1e-4, 1 - 1e-4)

    keep = batch_anns[:, 4] >= 0
    cp = cls_preds[keep]
    ba = batch_anns[keep]
    n_pos = (ba[:, 4] > 0).sum().item()
    if n_pos == 0:
        return 0.0, 0.0
    nc = cp.shape[1]
    gt1 = F.one_hot(ba[:, 4].long(), nc + 1)[:, 1:].float()
    af = torch.where(gt1 == 1.0, torch.tensor(alpha), torch.tensor(1 - alpha))
    pt = torch.where(gt1 == 1.0, cp, 1 - cp)
    fw = af * (1 - pt)**gamma
    bce = -(gt1 * torch.log(cp) + (1 - gt1) * torch.log(1 - cp))
    cls_loss = (fw * bce).sum().item() / n_pos

    posm = batch_anns[:, 4] > 0
    rp = reg_preds[posm]
    tgt = batch_anns[posm][:, :4]
    x = torch.abs(rp - tgt)
    sl1 = torch.where(x >= beta, x - 0.5 * beta, 0.5 * x**2 / beta)
    reg_loss = sl1.sum().item() / posm.sum().item()
    return cls_loss, reg_loss


def test_retina_loss_matches_reference():
    rng = np.random.RandomState(0)
    strides = (8, 16, 32, 64, 128)
    image = 128
    sizes = [[image // s, image // s] for s in strides]
    loss_obj = RetinaLoss()
    anchors = loss_obj.anchors.flat_anchors(sizes)
    n = anchors.shape[0]
    b, nc = 2, 6

    # sigmoid-prob predictions per level in [B,H,W,A,C]
    cls_levels, reg_levels = [], []
    for w, h in sizes:
        cls_levels.append(
            1 / (1 + np.exp(-rng.randn(b, h, w, 9, nc))).astype(np.float32))
        reg_levels.append(rng.randn(b, h, w, 9, 4).astype(np.float32))

    annots = np.full((b, 6, 5), -1.0, np.float32)
    annots[0, 0] = [8, 8, 60, 60, 2]
    annots[0, 1] = [30, 40, 100, 120, 4]
    annots[1, 0] = [12, 20, 90, 70, 1]

    ours = RetinaLoss(box_loss_type="SmoothL1")(
        ([jnp.asarray(c) for c in cls_levels],
         [jnp.asarray(r) for r in reg_levels]), jnp.asarray(annots))

    cls_flat = np.concatenate([c.reshape(b, -1, nc) for c in cls_levels], 1)
    reg_flat = np.concatenate([r.reshape(b, -1, 4) for r in reg_levels], 1)
    ref_cls, ref_reg = ref_retina_loss(cls_flat, reg_flat, anchors, annots)

    assert abs(float(ours["cls_loss"]) - ref_cls) < 2e-3 * max(ref_cls, 1)
    assert abs(float(ours["reg_loss"]) - ref_reg) < 2e-3 * max(ref_reg, 1)


def test_semantic_softmax_matches_reference():
    rng = np.random.RandomState(0)
    from simpleaicv_tpu.losses import SemanticSoftmaxLoss
    outs = [jnp.asarray(rng.randn(4, 7).astype(np.float32)),
            jnp.asarray(rng.randn(4, 5).astype(np.float32))]
    labels = np.array([[2, -1], [0, 3], [6, 1], [-1, -1]], np.int32)
    norm = [1.0, 2.0]
    ours = float(SemanticSoftmaxLoss(norm, smoothing=0.1)(
        outs, jnp.asarray(labels)))

    total = 0.0
    for i, o in enumerate(outs):
        o = torch.tensor(np.asarray(o))
        lab = torch.tensor(labels[:, i].astype(np.int64))
        lab_valid = lab.clone()
        lab_valid[lab_valid < 0] = 0
        logp = F.log_softmax(o, dim=1)
        n = o.shape[1]
        oh = torch.zeros_like(o).scatter_(1, lab_valid[:, None], 1)
        oh = oh * (1 - 0.1) + 0.1 / n
        ce = (-oh * logp) * (lab >= 0)[:, None]
        total += ce.sum(-1).mean().item() * norm[i]
    assert abs(ours - total) < 1e-4
