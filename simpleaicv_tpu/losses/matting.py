"""Human-matting losses (parity: reference
simpleAICV/human_matting/losses.py:21-290 — trimap CE/IoU on the global
3-class branch, unknown-region alpha L1 + Laplacian-pyramid losses on the
local branch, full-image alpha/Laplacian on the fused output, composition
loss). Preds are NHWC (global [b,h,w,3], local/fused [b,h,w,1]).

Trimap encoding (reference convention): 0 background, 128 unknown/local,
255 foreground/global.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.registry import LOSSES

__all__ = ["GlobalTrimapCELoss", "GloabelTrimapIouLoss", "LocalAlphaLoss",
           "LocalLaplacianLoss", "FusionAlphaLoss", "FusionLaplacianLoss",
           "CompositionLoss"]


def _convert_trimap(trimap):
    """0->0 (bg), 255->2 (fg/global), else(128)->1 (unknown/local)."""
    t = trimap.astype(jnp.int32)
    out = jnp.where(t == 255, 2, jnp.where(t == 0, 0, 1))
    return out


@LOSSES.register()
class GlobalTrimapCELoss:

    def __call__(self, global_pred, trimap):
        p = jnp.clip(global_pred.astype(jnp.float32).reshape(-1, 3), 1e-4,
                     1.0 - 1e-4)
        y = jax.nn.one_hot(_convert_trimap(trimap).reshape(-1), 3,
                           dtype=jnp.float32)
        bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        return jnp.mean(bce)


@LOSSES.register()
class GloabelTrimapIouLoss:

    def __init__(self, smooth=1e-4):
        self.smooth = smooth

    def __call__(self, global_pred, trimap):
        p = jnp.clip(global_pred.astype(jnp.float32).reshape(-1, 3), 1e-4,
                     1.0 - 1e-4)
        y = jax.nn.one_hot(_convert_trimap(trimap).reshape(-1), 3,
                           dtype=jnp.float32)
        inter = jnp.sum(p * y, axis=1)
        iou = 1.0 - (inter + self.smooth) / (
            jnp.sum(p, 1) + jnp.sum(y, 1) - inter + self.smooth)
        return jnp.mean(iou)


@LOSSES.register()
class LocalAlphaLoss:

    def __call__(self, local_pred, alpha, trimap):
        p = jnp.clip(local_pred.astype(jnp.float32)[..., 0], 1e-4, 1.0 - 1e-4)
        w = (trimap == 128).astype(jnp.float32)
        diff = (p - alpha.astype(jnp.float32)) * w
        loss = jnp.sqrt(diff**2 + 1e-12)
        return jnp.sum(loss) / (jnp.sum(w) + 1.0)


def _gauss_kernel(size=5, sigma=1.0):
    grid = np.mgrid[0:size, 0:size].T.astype(np.float32)
    g = np.exp((grid - size // 2)**2 / (-2 * sigma**2))**2
    k = np.sum(g, axis=2)
    return (k / k.sum()).astype(np.float32)


def _conv_gauss(img, kernel):
    """img [b,h,w,1]; replicate-pad then depthwise 5x5."""
    kw = kernel.shape[0]
    pad = kw // 2
    img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    k = jnp.asarray(kernel)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _laplacian_pyramid(img, kernel, levels=5):
    # clamp depth so every level keeps >=1 pixel (the reference assumes
    # 832^2 inputs where 5 levels always fit)
    import math
    levels = min(levels, int(math.log2(max(min(img.shape[1],
                                               img.shape[2]), 2))))
    pyr = []
    current = img
    for _ in range(levels):
        filtered = _conv_gauss(current, kernel)
        pyr.append(current - filtered)
        current = jax.lax.reduce_window(
            filtered, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID") / 4.0
    pyr.append(current)
    return pyr


class _LaplacianBase:

    def __init__(self):
        self.kernel = _gauss_kernel()

    def _lap_loss(self, pred, alpha):
        pyr_a = _laplacian_pyramid(alpha, self.kernel)
        pyr_p = _laplacian_pyramid(pred, self.kernel)
        return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pyr_a, pyr_p))


@LOSSES.register()
class LocalLaplacianLoss(_LaplacianBase):

    def __call__(self, local_pred, alpha, trimap):
        w = (trimap == 128).astype(jnp.float32)[..., None]
        p = jnp.clip(local_pred.astype(jnp.float32), 1e-4, 1.0 - 1e-4) * w
        a = alpha.astype(jnp.float32)[..., None] * w
        return self._lap_loss(p, a)


@LOSSES.register()
class FusionAlphaLoss:

    def __call__(self, fusion_pred, alpha):
        p = jnp.clip(fusion_pred.astype(jnp.float32)[..., 0], 1e-4,
                     1.0 - 1e-4)
        loss = jnp.sqrt((p - alpha.astype(jnp.float32))**2 + 1e-12)
        return jnp.mean(loss)


@LOSSES.register()
class FusionLaplacianLoss(_LaplacianBase):

    def __call__(self, fusion_pred, alpha):
        p = jnp.clip(fusion_pred.astype(jnp.float32), 1e-4, 1.0 - 1e-4)
        return self._lap_loss(p, alpha.astype(jnp.float32)[..., None])


@LOSSES.register()
class CompositionLoss:
    """||image*pred - image*alpha||_1 over fg composite (reference :261-290)."""

    def __call__(self, fusion_pred, alpha, image):
        p = fusion_pred.astype(jnp.float32)
        a = alpha.astype(jnp.float32)[..., None]
        img = image.astype(jnp.float32)
        diff = img * p - img * a
        return jnp.mean(jnp.sqrt(diff**2 + 1e-12))
