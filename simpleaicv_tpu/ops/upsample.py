"""Separable resize as matmuls — the TPU-first bilinear/nearest upsample.

Bilinear resize is linear in the input, so resizing H (or W) is exactly a
matmul by a small dense interpolation matrix R [out, in]:

    out = R_h @ x @ R_w^T        (einsum over the two spatial axes)

Both the forward AND the VJP are then plain matmuls on the MXU. The naive
formulations — gather-based indexing (detection/fpn.py's original
``_upsample_to``) or ``jax.image.resize`` — have scatter-add transposes,
which XLA lowers to serialized scatters on TPU: the measured SAM-B train
step dropped from 1751ms to ~250ms replacing one 256->1024 mask-resize VJP
(perf/resize_grad_probe.py), and every FPN top-down pathway carries the
same pattern.

Weight matrices are built in numpy at trace time (lru_cache'd) and baked
into the executable as constants:
  * ``align_corners=True``  — matches torch F.interpolate(align_corners=
    True), the reference's FPN/decoder convention.
  * ``half_pixel``          — matches jax.image.resize(method="bilinear")
    and torch align_corners=False for scale >= 1 (no antialias needed when
    upsampling; for downscale we reproduce jax's antialiased triangle
    kernel so the matmul path is exact for every size pair).

Nearest-neighbor integer upsample is a repeat (VJP: reshape-sum), not a
gather.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "upsample_nearest_2x"]


@lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool):
    """Dense [n_out, n_in] f32 bilinear interpolation matrix."""
    r = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        r[:, 0] = 1.0
        return r
    if align_corners:
        # corners map to corners (torch align_corners=True)
        src = np.linspace(0.0, n_in - 1.0, n_out)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        w = (src - lo).astype(np.float32)
        r[np.arange(n_out), lo] += 1.0 - w
        r[np.arange(n_out), hi] += w
        return r
    scale = n_in / n_out
    if scale <= 1.0:
        # upsample, half-pixel centers (jax.image.resize bilinear /
        # torch align_corners=False); edge-clamped taps
        src = (np.arange(n_out) + 0.5) * scale - 0.5
        lo = np.floor(src).astype(np.int64)
        w = (src - lo).astype(np.float32)
        lo_c = np.clip(lo, 0, n_in - 1)
        hi_c = np.clip(lo + 1, 0, n_in - 1)
        r[np.arange(n_out), lo_c] += 1.0 - w
        r[np.arange(n_out), hi_c] += w
        return r
    # downscale: jax.image.resize applies an antialiased triangle kernel
    # of half-width `scale`, sampled at half-pixel centers and normalized
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    idx = np.arange(n_in)[None, :]
    t = np.maximum(0.0, 1.0 - np.abs(idx - src[:, None]) / scale)
    r[:] = (t / t.sum(axis=1, keepdims=True)).astype(np.float32)
    return r


def _apply_axis(x, r_np, axis: int):
    """Contract x's `axis` against r [out, in] keeping layout and dtype."""
    # weights in the input compute dtype (bf16 activations stay bf16 —
    # same precision the gather-based path used for its weights); f32
    # inputs get HIGHEST precision or the TPU MXU would silently run the
    # contraction as one bf16 pass (measured 1.6e-2 abs error on masks)
    r = jnp.asarray(r_np).astype(x.dtype)
    prec = ("highest" if x.dtype in (jnp.float32, jnp.float64) else None)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("oi,...i->...o", r, x, precision=prec,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(x, out_hw, spatial_axes=(1, 2),
                    align_corners: bool = False):
    """Bilinear-resize two axes of ``x`` to ``out_hw`` via matmuls.

    ``align_corners=False`` reproduces jax.image.resize(method="bilinear")
    exactly for any size pair (antialiased on downscale); ``True``
    reproduces torch F.interpolate(mode="bilinear", align_corners=True).
    """
    ah, aw = spatial_axes
    h_out, w_out = out_hw
    h_in, w_in = x.shape[ah], x.shape[aw]
    if h_in != h_out:
        x = _apply_axis(x, _interp_matrix(h_in, h_out, align_corners), ah)
    if w_in != w_out:
        x = _apply_axis(x, _interp_matrix(w_in, w_out, align_corners), aw)
    return x


def upsample_nearest_2x(x, spatial_axes=(1, 2)):
    """Nearest 2x upsample as repeat (VJP is a reshape-sum, no scatter)."""
    ah, aw = spatial_axes
    x = jnp.repeat(x, 2, axis=ah)
    return jnp.repeat(x, 2, axis=aw)
