"""FCOSLoss end-to-end golden test vs a literal torch restatement of the
reference's per-image assignment + losses (simpleAICV/detection/losses.py:
432-836): center sampling, per-level mi ranges, min-area candidate choice,
centerness-weighted GIoU, positive-normalised focal."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.losses.detection import FCOSLoss
from simpleaicv_tpu.models.detection.anchor import FCOSPositions

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

INF = 100000000


def ref_assign(points, strides, mi, ann, radius=1.5):
    """numpy restatement of get_batch_position_annotations (one image)."""
    ann = ann[ann[:, 4] >= 0]
    p = points.shape[0]
    tgt = np.zeros((p, 6), np.float32)
    if ann.shape[0] == 0:
        return tgt
    m = ann.shape[0]
    gt = ann[:, :4]
    cand = np.tile(gt[None], (p, 1, 1)).astype(np.float32)
    pos = np.tile(points[:, None], (1, m, 1))
    ctr = (cand[:, :, 2:4] + cand[:, :, 0:2]) / 2
    judge = np.tile(strides[:, None] * radius, (1, m))
    cand[:, :, 0:2] = pos[:, :, 0:2] - cand[:, :, 0:2]
    cand[:, :, 2:4] = cand[:, :, 2:4] - pos[:, :, 0:2]
    flag = (cand.min(-1) > 0).astype(np.float32)[:, :, None]
    cand = cand * flag
    dist = np.sqrt((pos[:, :, 0] - ctr[:, :, 0])**2 +
                   (pos[:, :, 1] - ctr[:, :, 1])**2)
    cflag = (dist < judge).astype(np.float32)[:, :, None]
    cand = cand * cflag
    cmax = cand.max(-1)[:, :, None]
    mi_t = np.tile(mi[:, None], (1, m, 1))
    cand = cand * (cmax[:, :, 0] > mi_t[:, :, 0]).astype(
        np.float32)[:, :, None]
    cand = cand * (cmax[:, :, 0] < mi_t[:, :, 1]).astype(
        np.float32)[:, :, None]
    final = cand.sum(-1).sum(-1) > 0
    idxs = np.nonzero(final)[0]
    if len(idxs) == 0:
        return tgt
    pc = cand[idxs]
    wh = gt[:, 2:4] - gt[:, 0:2]
    area = np.tile((wh[:, 0] * wh[:, 1])[None], (len(idxs), 1))
    pcv = pc.sum(-1)
    area = np.where(pcv == 0.0, INF, area)
    mini = area.argmin(1)
    reg = pc[np.arange(len(idxs)), mini]
    cls = ann[:, 4][mini]
    tgt[idxs, 0:4] = reg
    tgt[idxs, 4] = cls + 1
    l, t, r, b = reg[:, 0], reg[:, 1], reg[:, 2], reg[:, 3]
    tgt[idxs, 5] = np.sqrt((np.minimum(l, r) / np.maximum(l, r)) *
                           (np.minimum(t, b) / np.maximum(t, b)))
    return tgt


def ref_losses(cls_preds, reg_preds, cnt_preds, targets, points, alpha=0.25,
               gamma=2.0):
    cls_preds = torch.tensor(cls_preds).reshape(-1, cls_preds.shape[-1])
    reg_preds = torch.tensor(reg_preds).reshape(-1, 4)
    cnt_preds = torch.tensor(cnt_preds).reshape(-1, 1)
    targets = torch.tensor(targets).reshape(-1, 8)
    cls_preds = torch.clamp(cls_preds, 1e-4, 1 - 1e-4)
    cnt_preds = torch.clamp(cnt_preds, 1e-4, 1 - 1e-4)
    n_pos = (targets[:, 4] > 0).sum().item()
    nc = cls_preds.shape[1]
    gt1 = F.one_hot(targets[:, 4].long(), nc + 1)[:, 1:].float()
    af = torch.where(gt1 == 1.0, torch.tensor(alpha), torch.tensor(1 - alpha))
    pt = torch.where(gt1 == 1.0, cls_preds, 1 - cls_preds)
    bce = -(gt1 * torch.log(cls_preds) + (1 - gt1) * torch.log(1 - cls_preds))
    cls_loss = (af * (1 - pt)**gamma * bce).sum().item() / max(n_pos, 1)

    posm = targets[:, 4] > 0
    rp = torch.exp(reg_preds[posm])
    tt = targets[posm]
    pred_min = tt[:, 6:8] - rp[:, 0:2]
    pred_max = tt[:, 6:8] + rp[:, 2:4]
    gt_min = tt[:, 6:8] - tt[:, 0:2]
    gt_max = tt[:, 6:8] + tt[:, 2:4]
    p1 = torch.cat([pred_min, pred_max], 1)
    g1 = torch.cat([gt_min, gt_max], 1)
    lt = torch.max(p1[:, :2], g1[:, :2])
    rb = torch.min(p1[:, 2:], g1[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    a1 = ((p1[:, 2:] - p1[:, :2]).clamp(min=0)).prod(1)
    a2 = ((g1[:, 2:] - g1[:, :2]).clamp(min=0)).prod(1)
    union = (a1 + a2 - inter).clamp(min=1e-4)
    iou = inter / union
    elt = torch.min(p1[:, :2], g1[:, :2])
    erb = torch.max(p1[:, 2:], g1[:, 2:])
    ewh = (erb - elt).clamp(min=0)
    earea = (ewh[:, 0] * ewh[:, 1]).clamp(min=1e-4)
    giou = iou - (earea - union) / earea
    reg_loss = (((1 - giou) * tt[:, 5]).sum() / max(n_pos, 1)).item()

    cp = cnt_preds[posm][:, 0]
    ct = tt[:, 5]
    cn = -(ct * torch.log(cp) + (1 - ct) * torch.log(1 - cp))
    cnt_loss = (cn.sum() / max(n_pos, 1)).item()
    return cls_loss, reg_loss, cnt_loss


def test_fcos_loss_matches_reference():
    rng = np.random.RandomState(0)
    strides5 = (8, 16, 32, 64, 128)
    mi5 = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    image = 128
    sizes = [[image // s, image // s] for s in strides5]
    positions = FCOSPositions(strides5)
    pos, stride_per_pt = positions.flat_positions_strides(sizes)
    mi = np.concatenate([
        np.tile(np.asarray(mi5[i], np.float32)[None],
                (int(fs[0]) * int(fs[1]), 1)) for i, fs in enumerate(sizes)])

    b, nc = 2, 6
    cls_levels, reg_levels, cnt_levels = [], [], []
    for w, h in sizes:
        cls_levels.append(
            1 / (1 + np.exp(-rng.randn(b, h, w, nc))).astype(np.float32))
        reg_levels.append(rng.randn(b, h, w, 4).astype(np.float32))
        cnt_levels.append(
            1 / (1 + np.exp(-rng.randn(b, h, w, 1))).astype(np.float32))

    annots = np.full((b, 5, 5), -1.0, np.float32)
    annots[0, 0] = [8, 8, 70, 70, 2]
    annots[0, 1] = [20, 30, 110, 126, 4]
    annots[1, 0] = [4, 4, 40, 48, 1]

    ours = FCOSLoss()(([jnp.asarray(c) for c in cls_levels],
                       [jnp.asarray(r) for r in reg_levels],
                       [jnp.asarray(c) for c in cnt_levels]),
                      jnp.asarray(annots))

    # reference restatement
    tgts = np.stack([ref_assign(pos, stride_per_pt, mi, annots[i])
                     for i in range(b)])
    tgts_full = np.concatenate(
        [tgts, np.tile(pos[None], (b, 1, 1))], axis=2)
    cls_flat = np.concatenate([c.reshape(b, -1, nc) for c in cls_levels], 1)
    reg_flat = np.concatenate([r.reshape(b, -1, 4) for r in reg_levels], 1)
    cnt_flat = np.concatenate([c.reshape(b, -1, 1) for c in cnt_levels], 1)
    ref_cls, ref_reg, ref_cnt = ref_losses(cls_flat, reg_flat, cnt_flat,
                                           tgts_full, pos)

    assert abs(float(ours["cls_loss"]) - ref_cls) < 2e-3 * max(ref_cls, 1)
    assert abs(float(ours["reg_loss"]) - ref_reg) < 2e-3 * max(ref_reg, 1)
    assert abs(float(ours["center_ness_loss"]) - ref_cnt) < \
        2e-3 * max(ref_cnt, 1)
