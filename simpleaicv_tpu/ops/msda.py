"""Multi-scale deformable attention — the reference's single native CUDA
extension (simpleAICV/detection/compile_multiscale_deformable_attention/,
~1.7k LoC of CUDA im2col kernels) rebuilt TPU-native.

Two implementations with one contract:
  * ``ms_deform_attn_xla``    — vectorised bilinear-gather core. The gather
    over flattened level features lowers to XLA dynamic-gather; autodiff
    provides the backward (the CUDA extension hand-writes it).
  * ``ms_deform_attn_pallas`` — Pallas TPU kernel of the same computation,
    processing query blocks in VMEM with the per-level value tables resident;
    used when levels fit VMEM. Falls back to the XLA core otherwise.

Semantics match the reference python fallback ``ms_deform_attn_core_pytorch``
(multiscale_deformable_attention.py:43-74): grid_sample bilinear with
zero padding and align_corners=False, i.e. pixel centers at (i+0.5)/size.

Equivalence is covered by tests/test_msda.py (mirroring the reference's
compile_multiscale_deformable_attention/test.py CUDA-vs-pytorch check).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(value_l, loc, h: int, w: int):
    """value_l [B, h*w, H, D]; loc [B, Lq, H, P, 2] normalised [0,1].
    Returns sampled [B, Lq, H, P, D] with zero padding outside."""
    b, _, heads, d = value_l.shape

    # align_corners=False: x_pix = x*W - 0.5
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        flat_idx = yi * w + xi                           # [B, Lq, H, P]
        # gather per batch & head: value_l [B, S, H, D]
        # -> use take_along_axis on S with idx broadcast over D
        idx = flat_idx.transpose(0, 2, 1, 3)             # [B, H, Lq, P]
        v = value_l.transpose(0, 2, 1, 3)                # [B, H, S, D]
        bq = idx.reshape(b, heads, -1)                   # [B, H, Lq*P]
        out = jnp.take_along_axis(v, bq[..., None], axis=2)
        out = out.reshape(b, heads, idx.shape[2], idx.shape[3], d)
        out = out.transpose(0, 2, 1, 3, 4)               # [B, Lq, H, P, D]
        return out * inside[..., None].astype(out.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def ms_deform_attn_xla(value, value_spatial_shapes,
                       sampling_locations, attention_weights):
    """value [B, S, H, D]; value_spatial_shapes: ((h0,w0), ...) static;
    sampling_locations [B, Lq, H, L, P, 2] in [0,1];
    attention_weights [B, Lq, H, L, P]. Returns [B, Lq, H*D]."""
    b, s, heads, d = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape

    outputs = jnp.zeros((b, lq, heads, d), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(value_spatial_shapes):
        h, w = int(h), int(w)
        value_l = value[:, start:start + h * w]
        loc = sampling_locations[:, :, :, lid]          # [B,Lq,H,P,2]
        sampled = _bilinear_gather_level(
            value_l.astype(jnp.float32), loc.astype(jnp.float32), h, w)
        wts = attention_weights[:, :, :, lid].astype(jnp.float32)
        outputs = outputs + jnp.sum(sampled * wts[..., None], axis=3)
        start += h * w
    return outputs.reshape(b, lq, heads * d)


def ms_deform_attn(value, value_spatial_shapes, sampling_locations,
                   attention_weights, use_pallas: bool = False):
    """Dispatcher.

    On TPU the XLA core is the production path BY DESIGN, not as a fallback:
    MSDA is a random-row gather (4 bilinear corners x L x P rows per query),
    and Mosaic's vector gather only supports indices shaped like the operand
    (mosaic/lowering.py _gather_lowering_rule), so an in-kernel row gather
    would need either a one-hot MXU matmul (64x the FLOPs) or serialized
    scalar dynamic-slices (~8k per query block) — both measured/estimated
    slower than XLA's native gather, which already runs near the op's
    memory roofline at DINO-DETR shapes (see ROADMAP.md round-2 MSDA
    numbers). ``use_pallas`` selects the Pallas kernel where it lowers
    (interpret mode / CPU) for equivalence testing.
    """
    if use_pallas and jax.default_backend() == "cpu":
        from .msda_pallas import ms_deform_attn_pallas
        return ms_deform_attn_pallas(value, value_spatial_shapes,
                                     sampling_locations, attention_weights)
    return ms_deform_attn_xla(value, value_spatial_shapes,
                              sampling_locations, attention_weights)
