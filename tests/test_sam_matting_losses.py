"""SAM-matting loss golden tests: our vectorised (b,L)-masked implementations
vs a literal torch restatement of the reference per-sample-loop semantics
(simpleAICV/interactive_segmentation/losses_matting.py:18/299/609/922)."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.losses.sam_matting import (
    SAMMattingOneLevelLoss, SAMMattingMultiLevelLoss,
    SAMMattingMultiLevelIoUMaxLoss, SAMMattingMultiLevelAssignLoss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

B, L, H, W = 3, 4, 64, 64
AREA_RANGES = [[0.04, 0.64], [0.0, 0.04], [0.01, 0.25], [0.16, 1.0]]


def build_gauss_kernel(size=5, sigma=1.0, n_channels=1):
    grid = np.float32(np.mgrid[0:size, 0:size].T)
    gaussian = lambda x: np.exp((x - size // 2)**2 / (-2 * sigma**2))**2
    kernel = np.sum(gaussian(grid), axis=2)
    kernel /= np.sum(kernel)
    kernel = np.tile(kernel, (n_channels, 1, 1))
    return torch.FloatTensor(kernel[:, None, :, :])


def conv_gauss(img, kernel):
    n_channels, _, kw, kh = kernel.shape
    img = F.pad(img, (kw // 2, kh // 2, kw // 2, kh // 2), mode="replicate")
    return F.conv2d(img, kernel, groups=n_channels)


def laplacian_pyramid(img, kernel, max_levels=5):
    current, pyr = img, []
    for _ in range(max_levels):
        filtered = conv_gauss(current, kernel)
        pyr.append(current - filtered)
        current = F.avg_pool2d(filtered, 2)
    pyr.append(current)
    return pyr


def lap_l1(a, b, n_channels):
    k = build_gauss_kernel(n_channels=n_channels)
    return sum(F.l1_loss(x, y) for x, y in
               zip(laplacian_pyramid(a, k), laplacian_pyramid(b, k)))


def convert_trimap(trimap):
    t = trimap.clone()
    t[t == 255] = 2
    t[t > 2] = 1
    return t


def ref_one_level(images, g, l, f, iou_pred, alpha, trimap, fg, bg,
                  thresh=0.5):
    """Reference OneLevel semantics; NCHW single-level tensors."""
    out = {}
    gp = g.permute(0, 2, 3, 1).float().clamp(1e-4, 1 - 1e-4)
    y = F.one_hot(convert_trimap(trimap).long(), 3).float()
    bce = -(y * torch.log(gp) + (1 - y) * torch.log(1 - gp))
    out["ce"] = bce.mean()

    p2 = gp.reshape(-1, 3)
    y2 = y.reshape(-1, 3)
    inter = (p2 * y2).sum(1)
    out["iou"] = (1 - (inter + 1e-4) / (p2.sum(1) + y2.sum(1) - inter + 1e-4)
                  ).mean()

    lp = l[:, 0].float().clamp(1e-4, 1 - 1e-4)
    wm = (trimap == 128).float()
    diff = (lp - alpha) * wm
    out["local_alpha"] = torch.sqrt(diff**2 + 1e-12).sum() / (wm.sum() + 1)

    lw = (l.float().clamp(1e-4, 1 - 1e-4) * wm[:, None])
    aw = alpha[:, None] * wm[:, None]
    out["local_lap"] = lap_l1(lw, aw, 1)

    fp = f[:, 0].float().clamp(1e-4, 1 - 1e-4)
    out["fusion_alpha"] = torch.sqrt((fp - alpha)**2 + 1e-12).mean()
    out["fusion_lap"] = lap_l1(f.float().clamp(1e-4, 1 - 1e-4),
                               alpha[:, None], 1)

    f3 = fp[:, None].repeat(1, 3, 1, 1)
    comp = f3 * fg + (1 - f3) * bg
    out["comp"] = torch.sqrt((comp - images)**2 + 1e-12).mean()

    fb = (fp >= thresh).float().reshape(B, -1)
    ab = (alpha >= thresh).float().reshape(B, -1)
    it = (fb * ab).sum(1)
    iou_gt = (it + 1e-4) / (fb.sum(1) + ab.sum(1) - it + 1e-4)
    out["iou_pred"] = F.mse_loss(iou_pred.reshape(B), iou_gt,
                                 reduction="sum") / B
    return out


def make_inputs(seed=0):
    r = np.random.RandomState(seed)
    images = r.rand(B, H, W, 3).astype(np.float32)
    g = r.rand(B, L, H, W, 3).astype(np.float32)
    l = r.rand(B, L, H, W, 1).astype(np.float32)
    f = r.rand(B, L, H, W, 1).astype(np.float32)
    iou_pred = r.rand(B, L).astype(np.float32)
    # alpha with controlled area ratios so Assign gating has varied validity
    alpha = np.zeros((B, H, W), np.float32)
    alpha[0, :12, :12] = r.rand(12, 12)          # ratio ~0.035
    alpha[1, :40, :40] = r.rand(40, 40)          # ratio ~0.39
    alpha[2] = r.rand(H, W)                      # ratio ~1.0
    trimap = r.choice([0, 128, 255], size=(B, H, W)).astype(np.float32)
    fg = r.rand(B, H, W, 3).astype(np.float32)
    bg = r.rand(B, H, W, 3).astype(np.float32)
    return images, g, l, f, iou_pred, alpha, trimap, fg, bg


def to_torch_nchw(x):
    t = torch.tensor(x)
    if t.ndim == 5:      # [b,L,h,w,c] -> [b,L,c,h,w]
        return t.permute(0, 1, 4, 2, 3).contiguous()
    if t.ndim == 4:      # [b,h,w,c] -> [b,c,h,w]
        return t.permute(0, 3, 1, 2).contiguous()
    return t


KEYMAP = {
    "ce": "global_pred_trimap_ce_loss",
    "iou": "gloabel_pred_trimap_iou_loss",
    "local_alpha": "local_pred_alpha_loss",
    "local_lap": "local_pred_laplacian_loss",
    "fusion_alpha": "fusion_pred_alpha_loss",
    "fusion_lap": "fusion_pred_laplacian_loss",
    "comp": "composition_loss",
    "iou_pred": "fused_pred_iou_predict_loss",
}


def assert_close(got, ref, tol=2e-4):
    for k, name in KEYMAP.items():
        np.testing.assert_allclose(float(got[name]), float(ref[k]),
                                   rtol=tol, atol=tol, err_msg=k)


def test_one_level_golden():
    images, g, l, f, iou_pred, alpha, trimap, fg, bg = make_inputs()
    g1, l1, f1, i1 = g[:, :1], l[:, :1], f[:, :1], iou_pred[:, :1]
    got = SAMMattingOneLevelLoss()(
        jnp.asarray(images), (jnp.asarray(g1), jnp.asarray(l1),
                              jnp.asarray(f1), jnp.asarray(i1)),
        (jnp.asarray(alpha), jnp.asarray(trimap), jnp.asarray(fg),
         jnp.asarray(bg)))
    ref = ref_one_level(to_torch_nchw(images), to_torch_nchw(g1)[:, 0],
                        to_torch_nchw(l1)[:, 0], to_torch_nchw(f1)[:, 0],
                        torch.tensor(i1), torch.tensor(alpha),
                        torch.tensor(trimap), to_torch_nchw(fg),
                        to_torch_nchw(bg))
    assert_close(got, ref)


def test_multi_level_golden():
    """MultiLevel == reference: GT broadcast over levels, global means,
    local_alpha denominator uses the repeated weight sum."""
    images, g, l, f, iou_pred, alpha, trimap, fg, bg = make_inputs(1)
    got = SAMMattingMultiLevelLoss()(
        jnp.asarray(images), (jnp.asarray(g), jnp.asarray(l), jnp.asarray(f),
                              jnp.asarray(iou_pred)),
        (jnp.asarray(alpha), jnp.asarray(trimap), jnp.asarray(fg),
         jnp.asarray(bg)))

    # torch restatement (losses_matting.py:299-607): flatten levels into the
    # batch then reuse the OneLevel math with the repeated-GT denominators.
    timages = to_torch_nchw(images)
    tg, tl, tf = to_torch_nchw(g), to_torch_nchw(l), to_torch_nchw(f)
    talpha, ttrimap = torch.tensor(alpha), torch.tensor(trimap)
    tfg, tbg = to_torch_nchw(fg), to_torch_nchw(bg)

    gp = tg.permute(0, 1, 3, 4, 2).float().clamp(1e-4, 1 - 1e-4)
    y = F.one_hot(convert_trimap(ttrimap)[:, None].repeat(1, L, 1, 1).long(),
                  3).float()
    ce = (-(y * torch.log(gp) + (1 - y) * torch.log(1 - gp))).mean()

    p2, y2 = gp.reshape(-1, 3), y.reshape(-1, 3)
    inter = (p2 * y2).sum(1)
    iou = (1 - (inter + 1e-4) / (p2.sum(1) + y2.sum(1) - inter + 1e-4)).mean()

    lp = tl[:, :, 0].float().clamp(1e-4, 1 - 1e-4)
    wm = (ttrimap == 128).float()[:, None].repeat(1, L, 1, 1)
    diff = (lp - talpha[:, None]) * wm
    local_alpha = torch.sqrt(diff**2 + 1e-12).sum() / (wm.sum() + 1)
    local_lap = lap_l1(lp * wm, talpha[:, None].repeat(1, L, 1, 1) * wm, L)

    fp = tf[:, :, 0].float().clamp(1e-4, 1 - 1e-4)
    fusion_alpha = torch.sqrt((fp - talpha[:, None])**2 + 1e-12).mean()
    fusion_lap = lap_l1(fp, talpha[:, None].repeat(1, L, 1, 1), L)

    f3 = fp[:, :, None].repeat(1, 1, 3, 1, 1)
    comp = f3 * tfg[:, None] + (1 - f3) * tbg[:, None]
    comp = torch.sqrt((comp - timages[:, None])**2 + 1e-12).mean()

    fb = (fp >= 0.5).float().reshape(B, L, -1)
    ab = (talpha[:, None].repeat(1, L, 1, 1) >= 0.5).float().reshape(B, L, -1)
    it = (fb * ab).sum(-1)
    iou_gt = (it + 1e-4) / (fb.sum(-1) + ab.sum(-1) - it + 1e-4)
    # reference losses_matting.py MultiLevel fusion_iou_predict_loss:
    # mse(sum) / batch_size / level_count
    iou_pred_loss = F.mse_loss(torch.tensor(iou_pred), iou_gt,
                               reduction="sum") / B / L

    ref = dict(ce=ce, iou=iou, local_alpha=local_alpha, local_lap=local_lap,
               fusion_alpha=fusion_alpha, fusion_lap=fusion_lap, comp=comp,
               iou_pred=iou_pred_loss)
    assert_close(got, ref)


def test_iou_max_golden():
    images, g, l, f, iou_pred, alpha, trimap, fg, bg = make_inputs(2)
    got = SAMMattingMultiLevelIoUMaxLoss()(
        jnp.asarray(images), (jnp.asarray(g), jnp.asarray(l), jnp.asarray(f),
                              jnp.asarray(iou_pred)),
        (jnp.asarray(alpha), jnp.asarray(trimap), jnp.asarray(fg),
         jnp.asarray(bg)))

    # reference selection (:946-968): threshold fused vs GT, argmax IoU
    tf = to_torch_nchw(f)
    talpha = torch.tensor(alpha)
    fb = (tf[:, :, 0].float() >= 0.5).float()
    ab = (talpha[:, None] >= 0.5).float()
    inter = (fb * ab).flatten(2).sum(-1)
    union = fb.flatten(2).sum(-1) + ab.flatten(2).sum(-1) - inter + 1e-4
    sel = (inter / union).argmax(1)

    bidx = torch.arange(B)
    g_s = to_torch_nchw(g)[bidx, sel]
    l_s = to_torch_nchw(l)[bidx, sel]
    f_s = tf[bidx, sel]
    i_s = torch.tensor(iou_pred)[bidx, sel][:, None]
    ref = ref_one_level(to_torch_nchw(images), g_s, l_s, f_s, i_s, talpha,
                        torch.tensor(trimap), to_torch_nchw(fg),
                        to_torch_nchw(bg))
    assert_close(got, ref)


def test_assign_golden():
    images, g, l, f, iou_pred, alpha, trimap, fg, bg = make_inputs(3)
    got = SAMMattingMultiLevelAssignLoss(area_ranges=AREA_RANGES)(
        jnp.asarray(images), (jnp.asarray(g), jnp.asarray(l), jnp.asarray(f),
                              jnp.asarray(iou_pred)),
        (jnp.asarray(alpha), jnp.asarray(trimap), jnp.asarray(fg),
         jnp.asarray(bg)))

    # reference per-sample loops (:1010-1633)
    timages = to_torch_nchw(images)
    tg, tl, tf = to_torch_nchw(g), to_torch_nchw(l), to_torch_nchw(f)
    talpha, ttrimap = torch.tensor(alpha), torch.tensor(trimap)
    tfg, tbg = to_torch_nchw(fg), to_torch_nchw(bg)
    tiou = torch.tensor(iou_pred)

    ratio = (talpha > 0).float().flatten(1).mean(1)
    ratio_thr = (talpha >= 0.5).float().flatten(1).mean(1)
    # the reference's local_laplacian_loss gates by the WEIGHTED alpha's
    # area (alpha * [trimap==128] > 0, losses_matting.py:1253-1278) — the
    # only Assign term that does; caught by the true-reference parity test
    ratio_wm = ((talpha > 0) & (ttrimap == 128)).float().flatten(1).mean(1)

    def masked(fn, use_thresh_ratio=False, use_weighted_ratio=False):
        rr = (ratio_thr if use_thresh_ratio
              else ratio_wm if use_weighted_ratio else ratio)
        total, valid_b = 0.0, 0.0
        for i in range(B):
            s, n = 0.0, 0
            for j, (lo, hi) in enumerate(AREA_RANGES):
                if lo < rr[i] < hi:
                    s = s + fn(i, j)
                    n += 1
            if n > 0:
                total = total + s / n
                valid_b += 1
        return total / max(valid_b, 1.0)

    y3 = F.one_hot(convert_trimap(ttrimap).long(), 3).float()

    def ce_ij(i, j):
        gp = tg[i, j].permute(1, 2, 0).float().clamp(1e-4, 1 - 1e-4)
        bce = -(y3[i] * torch.log(gp) + (1 - y3[i]) * torch.log(1 - gp))
        return bce.mean()

    def iou_ij(i, j):
        gp = tg[i, j].permute(1, 2, 0).float().clamp(1e-4,
                                                     1 - 1e-4).reshape(-1, 3)
        yy = y3[i].reshape(-1, 3)
        inter = (gp * yy).sum(1)
        return (1 - (inter + 1e-4) /
                (gp.sum(1) + yy.sum(1) - inter + 1e-4)).mean()

    wm = (ttrimap == 128).float()

    def la_ij(i, j):
        lp = tl[i, j, 0].float().clamp(1e-4, 1 - 1e-4)
        diff = (lp - talpha[i]) * wm[i]
        return torch.sqrt(diff**2 + 1e-12).sum() / (wm[i].sum() + 1)

    def lap_ij(i, j):
        lp = (tl[i, j].float().clamp(1e-4, 1 - 1e-4) * wm[i][None])[None]
        aa = (talpha[i][None] * wm[i][None])[None]
        return lap_l1(lp, aa, 1)

    def fa_ij(i, j):
        fp = tf[i, j, 0].float().clamp(1e-4, 1 - 1e-4)
        return torch.sqrt((fp - talpha[i])**2 + 1e-12).mean()

    def flap_ij(i, j):
        fp = tf[i, j].float().clamp(1e-4, 1 - 1e-4)[None]
        return lap_l1(fp, talpha[i][None][None], 1)

    def comp_ij(i, j):
        fp = tf[i, j, 0].float().clamp(1e-4, 1 - 1e-4)[None].repeat(3, 1, 1)
        comp = fp * tfg[i] + (1 - fp) * tbg[i]
        return torch.sqrt((comp - timages[i])**2 + 1e-12).mean()

    def ioup_ij(i, j):
        fb = (tf[i, j, 0].float() >= 0.5).float().reshape(-1)
        ab = (talpha[i] >= 0.5).float().reshape(-1)
        it = (fb * ab).sum()
        iou_gt = (it + 1e-4) / (fb.sum() + ab.sum() - it + 1e-4)
        return F.mse_loss(tiou[i, j], iou_gt, reduction="sum")

    ref = dict(ce=masked(ce_ij), iou=masked(iou_ij), local_alpha=masked(la_ij),
               local_lap=masked(lap_ij, use_weighted_ratio=True),
               fusion_alpha=masked(fa_ij),
               fusion_lap=masked(flap_ij), comp=masked(comp_ij),
               iou_pred=masked(ioup_ij, use_thresh_ratio=True))
    assert_close(got, ref)
