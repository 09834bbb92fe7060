"""Pallas TPU kernel for multi-scale deformable attention.

Layout: grid over (batch*heads, query blocks); the head's full flattened
value table [S, D] stays resident in VMEM (bf16: ~5.6MB for DINO-DETR's
87k x 32 table) while each query block computes its L*P bilinear samples as
gathers + VPU blends, accumulating in f32.

STATUS (round 2, measured on v5e): this kernel is the interpret-mode
REFERENCE implementation. Mosaic's vector gather lowering only accepts
indices shaped like the operand (mosaic/lowering.py:_gather_lowering_rule
asserts ``indices.shape == operand.shape + (1,)``), so the [Bq]-rows-from-
[S,D] gather here does not lower on TPU; the production TPU path is the XLA
core in ops/msda.py, which runs near the op's memory roofline at DINO-DETR
shapes (numbers in ROADMAP.md). The two candidate in-kernel encodings are
strictly worse: one-hot MXU matmul multiplies FLOPs by the table size, and
SMEM-scalar dynamic-slice loops serialize ~8k row loads per query block.
Equivalence: tests/test_msda_pallas.py (interpret mode == XLA core == C++).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _msda_kernel(value_ref, loc_ref, w_ref, o_ref, *, spatial_shapes,
                 n_points: int):
    """value [S,D]; loc [Bq, L*P*2]; w [Bq, L*P]; out [Bq, D]."""
    bq = loc_ref.shape[0]
    d = value_ref.shape[1]
    acc = jnp.zeros((bq, d), jnp.float32)
    start = 0
    n_levels = len(spatial_shapes)
    for lid, (h, w_sz) in enumerate(spatial_shapes):
        for p in range(n_points):
            col = (lid * n_points + p)
            x = loc_ref[:, 2 * col] * w_sz - 0.5
            y = loc_ref[:, 2 * col + 1] * h - 0.5
            aw = w_ref[:, col]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            wx = (x - x0)
            wy = (y - y0)
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = x0 + dx
                    yi = y0 + dy
                    inside = ((xi >= 0) & (xi < w_sz) & (yi >= 0) &
                              (yi < h))
                    xi_c = jnp.clip(xi, 0, w_sz - 1).astype(jnp.int32)
                    yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                    idx = start + yi_c * w_sz + xi_c          # [Bq]
                    # Mosaic dynamic_gather pattern: indices broadcast to the
                    # output shape, gathering along axis 0
                    idx2 = jnp.broadcast_to(idx[:, None], (bq, d))
                    rows = jnp.take_along_axis(value_ref[...], idx2,
                                               axis=0).astype(jnp.float32)
                    bw = ((wx if dx else 1.0 - wx) *
                          (wy if dy else 1.0 - wy))
                    coef = aw * bw * inside.astype(jnp.float32)
                    acc = acc + rows * coef[:, None]
        start += h * w_sz
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "block_q",
                                             "interpret"))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, block_q: int = 128,
                          interpret: bool | None = None):
    """Same contract as ops.msda.ms_deform_attn_xla."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, heads, d = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    block_q = min(block_q, lq)

    pad_q = (block_q - lq % block_q) % block_q
    lqp = lq + pad_q
    # lane alignment: Mosaic gathers want a 128-multiple minor dim
    pad_d = (128 - d % 128) % 128
    dp = d + pad_d

    # [B*H, S, D]
    v = value.transpose(0, 2, 1, 3).reshape(b * heads, s, d)
    if pad_d:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_d)))
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        b * heads, lq, n_levels * n_points * 2)
    wts = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * heads, lq, n_levels * n_points)
    if pad_q:
        loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, pad_q), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_msda_kernel, spatial_shapes=spatial_shapes,
                          n_points=n_points),
        grid=(b * heads, lqp // block_q),
        in_specs=[
            pl.BlockSpec((None, s, dp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_q, n_levels * n_points * 2),
                         lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, n_levels * n_points),
                         lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, dp), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, lqp, dp), jnp.float32),
        interpret=interpret,
    )(v, loc, wts)
    out = out[:, :lq, :d].reshape(b, heads, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, heads * d)
