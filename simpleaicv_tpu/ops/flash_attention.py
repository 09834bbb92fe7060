"""Flash attention as Pallas TPU kernels, forward + custom-VJP backward.

The reference scales attention architecturally (SAM windowed attention with 4
global layers, optional xformers memory-efficient attention per its ReadMe env
notes — SURVEY.md §5); the TPU-native answer is an online-softmax blocked
kernel: O(N) memory, softmax fused with both matmuls on the MXU, f32
accumulators over bf16 operands.

Backward follows the FlashAttention-2 recipe: the forward saves the
row-logsumexp; the backward recomputes probabilities blockwise
(p = exp(s - lse)) and accumulates
    dv += p^T dO
    ds  = p * (dO v^T - delta),   delta = rowsum(dO * o)
    dq += ds k * scale,   dk += ds^T q * scale
as two kernels (dq over q-blocks; dk/dv over k-blocks).

Used by the ViT backbone / SAM global-attention layers when
``use_flash_attention`` is set; the einsum path remains the reference
implementation for equivalence tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                scale: float):
    """Grid: (batch*heads, num_q_blocks). K/V for this (b,h) are fully
    resident in VMEM; loop over K blocks with online softmax."""
    q = q_ref[...].astype(jnp.float32) * scale      # [Bq, d]
    n_k = k_ref.shape[0]
    num_kb = n_k // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [Bq, Bk]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    init = (jnp.zeros((q.shape[0], d), jnp.float32),
            jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32),
            jnp.zeros((q.shape[0], 1), jnp.float32))
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(l))[:, 0]


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               block_k: int, scale: float):
    """Grid: (batch*heads, num_q_blocks)."""
    q = q_ref[...].astype(jnp.float32) * scale
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...][:, None]
    delta = delta_ref[...][:, None]
    n_k = k_ref.shape[0]
    num_kb = n_k // block_k

    def body(i, dq):
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32))
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                dv_ref, *, block_q: int, scale: float):
    """Grid: (batch*heads, num_k_blocks)."""
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    n_q = q_ref.shape[0]
    num_qb = n_q // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[pl.ds(i * block_q, block_q)][:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [Bq, Bk]
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    d = k.shape[-1]
    dk, dv = jax.lax.fori_loop(
        0, num_qb, body, (jnp.zeros((k.shape[0], d), jnp.float32),
                          jnp.zeros((k.shape[0], d), jnp.float32)))
    # q was pre-scaled inside the loop, so dk already carries the scale
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _fwd_call(q, k, v, block_q, block_k, interpret):
    bh, n, d = q.shape
    scale = d**-0.5
    return pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, block_q, block_k, interpret):
    o, _ = _fwd_call(q, k, v, block_q, block_k, interpret)
    return o


def _flash_core_fwd(q, k, v, block_q, block_k, interpret):
    o, lse = _fwd_call(q, k, v, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    bh, n, d = q.shape
    scale = d**-0.5
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, scale=scale),
        grid=(bh, n // block_k),
        in_specs=[
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n), lambda i, j: (i, 0)),
            pl.BlockSpec((None, n), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None):
    """q/k/v: [B, H, N, d] -> [B, H, N, d]. N must be a multiple of the block
    sizes (pad beforehand; ViT/SAM token counts are static). Differentiable
    (custom VJP, FlashAttention-2 backward)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, n, d = q.shape
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0, (n, block_q, block_k)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out = _flash_core(qf, kf, vf, block_q, block_k, interpret)
    return out.reshape(b, h, n, d)


def reference_attention(q, k, v):
    """Plain softmax attention (f32 softmax) for equivalence tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


# ---------------- decomposed-rel-pos flash attention (SAM) ----------------
#
# SAM's ViT encoder adds a decomposed relative-position bias
#   attn[q, kh, kw] += rel_h[q, kh] + rel_w[q, kw]
# (reference image_encoder.py:82-147). With block_k = k_w, the k-blocks walk
# the key grid row by row, so the bias block for (q-block, row j) is
#   rel_h[qblock, j] broadcast + rel_w[qblock, :]
# — no [N,N] bias is ever materialized. The VJP returns d(rel_h)/d(rel_w)
# as in-kernel row/column sums of ds; the outer einsums that build
# rel_h/rel_w from the learned tables stay in XLA and autodiff normally.


def _relpos_fwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref,
                       *, k_w: int, scale: float):
    q = q_ref[...].astype(jnp.float32) * scale
    rw = rw_ref[...].astype(jnp.float32)            # [Bq, Kw]
    num_rows = rh_ref.shape[-1]

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(j * k_w, k_w), :].astype(jnp.float32)
        v = v_ref[pl.ds(j * k_w, k_w), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + rh_ref[:, j][:, None].astype(jnp.float32) + rw
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    init = (jnp.zeros((q.shape[0], d), jnp.float32),
            jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32),
            jnp.zeros((q.shape[0], 1), jnp.float32))
    acc, m, l = jax.lax.fori_loop(0, num_rows, body, init)
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(l))[:, 0]


def _relpos_dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, drh_ref, drw_ref, *, k_w: int,
                      scale: float):
    q = q_ref[...].astype(jnp.float32) * scale
    rw = rw_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...][:, None]
    delta = delta_ref[...][:, None]
    num_rows = rh_ref.shape[-1]
    bq, d = q.shape

    def body(j, carry):
        dq, drh, drw = carry
        k = k_ref[pl.ds(j * k_w, k_w), :].astype(jnp.float32)
        v = v_ref[pl.ds(j * k_w, k_w), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + rh_ref[:, j][:, None].astype(jnp.float32) + rw
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq = dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)
        row_sum = jnp.sum(ds, axis=-1)              # [Bq]
        drh = drh + row_sum[:, None] * (jax.lax.broadcasted_iota(
            jnp.int32, (bq, num_rows), 1) == j).astype(jnp.float32)
        drw = drw + ds
        return dq, drh, drw

    init = (jnp.zeros((bq, d), jnp.float32),
            jnp.zeros((bq, num_rows), jnp.float32),
            jnp.zeros((bq, k_w), jnp.float32))
    dq, drh, drw = jax.lax.fori_loop(0, num_rows, body, init)
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)
    drh_ref[...] = drh.astype(drh_ref.dtype)
    drw_ref[...] = drw.astype(drw_ref.dtype)


def _relpos_dkv_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, *, block_q: int, k_w: int,
                       scale: float):
    j = pl.program_id(1)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    n_q = q_ref.shape[0]
    num_qb = n_q // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[pl.ds(i * block_q, block_q)][:, None]
        rh = rh_ref[pl.ds(i * block_q, block_q), j][:, None]
        rw = rw_ref[pl.ds(i * block_q, block_q), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + rh.astype(jnp.float32) + rw.astype(jnp.float32)
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    d = k.shape[-1]
    dk, dv = jax.lax.fori_loop(
        0, num_qb, body, (jnp.zeros((k_w, d), jnp.float32),
                          jnp.zeros((k_w, d), jnp.float32)))
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _relpos_fwd_call(q, k, v, rel_h, rel_w, block_q, interpret):
    bh, n, d = q.shape
    k_h, k_w = rel_h.shape[-1], rel_w.shape[-1]
    scale = d**-0.5
    return pl.pallas_call(
        functools.partial(_relpos_fwd_kernel, k_w=k_w, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_q, k_h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, k_w), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_relpos_core(q, k, v, rel_h, rel_w, block_q, interpret):
    o, _ = _relpos_fwd_call(q, k, v, rel_h, rel_w, block_q, interpret)
    return o


def _flash_relpos_fwd(q, k, v, rel_h, rel_w, block_q, interpret):
    o, lse = _relpos_fwd_call(q, k, v, rel_h, rel_w, block_q, interpret)
    return o, (q, k, v, rel_h, rel_w, o, lse)


def _flash_relpos_bwd(block_q, interpret, res, do):
    q, k, v, rel_h, rel_w, o, lse = res
    bh, n, d = q.shape
    k_h, k_w = rel_h.shape[-1], rel_w.shape[-1]
    scale = d**-0.5
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    dq, drh, drw = pl.pallas_call(
        functools.partial(_relpos_dq_kernel, k_w=k_w, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_q, k_h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, k_w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
            pl.BlockSpec((None, block_q), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, k_h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, k_w), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, k_h), rel_h.dtype),
            jax.ShapeDtypeStruct((bh, n, k_w), rel_w.dtype),
        ],
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_relpos_dkv_kernel, block_q=block_q, k_w=k_w,
                          scale=scale),
        grid=(bh, k_h),
        in_specs=[
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, k_w, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, k_w, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, k_h), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, k_w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n), lambda i, j: (i, 0)),
            pl.BlockSpec((None, n), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, k_w, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, k_w, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, do, lse, delta)

    return dq, dk, dv, drh, drw


_flash_relpos_core.defvjp(_flash_relpos_fwd, _flash_relpos_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention_relpos(q, k, v, rel_h, rel_w,
                           block_q: int = DEFAULT_BLOCK_Q,
                           interpret: bool | None = None):
    """Flash attention with SAM's decomposed rel-pos bias.

    q/k/v: [BH, N, d] with N = k_h*k_w over a key grid; rel_h [BH, N, k_h],
    rel_w [BH, N, k_w]; bias[q, kh*k_w+kw] = rel_h[q,kh] + rel_w[q,kw].
    Differentiable in all five tensor args.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bh, n, d = q.shape
    block_q = min(block_q, n)
    assert n % block_q == 0, (n, block_q)
    assert rel_h.shape[-1] * rel_w.shape[-1] == n, (rel_h.shape,
                                                    rel_w.shape, n)
    return _flash_relpos_core(q, k, v, rel_h, rel_w, block_q, interpret)


# ---------------- XLA online-softmax implementations ----------------
#
# The Pallas kernels above do not lower on the production TPU stack: the
# relpos variant hits the "last two block dims divisible by (8, 128)"
# lowering restriction (head_dim 64), and where Pallas does lower, this
# relay stack caps it at ~300GB/s vs >1TB/s for XLA fusions
# (perf/pallas_bw_probe.py, ROADMAP round-2). The production flash path is
# therefore blockwise online softmax written in plain XLA under lax.scan —
# O(N) residual memory (only o and the row-logsumexp are saved) — with a
# FlashAttention-2 backward that recomputes probabilities in one einsum
# (transient [BH,N,N], matmuls only). Measured at the SAM-B global-layer
# shape (bh12 n4096 d64, perf/attn_probe.py): fwd 3.07ms vs 8.27ms for the
# materialize-everything einsum path.


def _xla_fwd_pass(q, k, v, relpos, block_k, kv_len=None):
    """Shared scan: ``relpos`` is None or ``(rel_h, rel_w)`` — SAM's
    decomposed bias, built PER KEY BLOCK inside the scan body so the full
    [BH, N, N] bias is never materialized (at SAM-B's 4096-token global
    layers that tensor is 805 MB/layer in f32; the round-5 trace named it
    the encoder's dominant HBM traffic and the b8 compile killer).

    ``kv_len`` (static) masks key positions >= kv_len to -inf — used by the
    auto-padding wrapper so sequence lengths that don't divide the block
    (ViT's 197 = 14x14+cls) still take the flash path."""
    bh, n_kv = q.shape[0], k.shape[1]
    d = q.shape[-1]
    scale = d**-0.5
    qf = q.astype(jnp.float32) * scale
    nb = n_kv // block_k
    kb = k.reshape(bh, nb, block_k, d).transpose(1, 0, 2, 3)
    vb = v.reshape(bh, nb, block_k, d).transpose(1, 0, 2, 3)
    starts = jnp.arange(nb, dtype=jnp.int32) * block_k
    lane = jnp.arange(block_k, dtype=jnp.int32)
    if relpos is not None:
        rel_h, rel_w = relpos
        n_q, k_w = rel_h.shape[1], rel_w.shape[-1]
        rows = block_k // k_w
        # [nb, BH, Nq, rows] — k_h-axis slices, tiny vs the full bias
        rhb = rel_h.astype(jnp.float32).reshape(
            bh, n_q, nb, rows).transpose(2, 0, 1, 3)
        rwf = rel_w.astype(jnp.float32)

    def body(carry, inp):
        acc, m_prev, l_prev = carry
        if relpos is None:
            kblk, vblk, start = inp
            s = jnp.einsum("bnd,bmd->bnm", qf, kblk.astype(jnp.float32))
        else:
            kblk, vblk, rh, start = inp
            s = jnp.einsum("bnd,bmd->bnm", qf, kblk.astype(jnp.float32))
            s = (s.reshape(bh, -1, rows, k_w) + rh[..., :, None]
                 + rwf[:, :, None, :]).reshape(s.shape)
        if kv_len is not None:
            s = jnp.where((start + lane < kv_len)[None, None, :], s,
                          -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bnm,bmd->bnd", p.astype(v.dtype), vblk,
            preferred_element_type=jnp.float32)
        return (acc, m_new, l_new), None

    n_q = q.shape[1]
    init = (jnp.zeros((bh, n_q, d), jnp.float32),
            jnp.full((bh, n_q, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bh, n_q, 1), jnp.float32))
    xs = ((kb, vb, starts) if relpos is None
          else (kb, vb, rhb, starts))
    (acc, m, l), _ = jax.lax.scan(body, init, xs)
    o = (acc / l).astype(q.dtype)
    lse = (m + jnp.log(l))[..., 0]                    # [BH, N]
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _xla_flash_core(q, k, v, block_k, kv_len=None):
    o, _ = _xla_fwd_pass(q, k, v, None, block_k, kv_len)
    return o


def _xla_flash_fwd(q, k, v, block_k, kv_len=None):
    o, lse = _xla_fwd_pass(q, k, v, None, block_k, kv_len)
    return o, (q, k, v, o, lse)


def _xla_flash_bwd(block_k, kv_len, res, do):
    q, k, v, o, lse = res
    d = q.shape[-1]
    scale = d**-0.5
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if kv_len is not None:
        s = jnp.where(
            (jnp.arange(k.shape[1]) < kv_len)[None, None, :], s, -jnp.inf)
    p = jnp.exp(s - lse[..., None])                   # [BH, N, N] transient
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)
    dv = jnp.einsum("bnm,bnd->bmd", p.astype(do.dtype), do,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bnd,bmd->bnm", dof, v.astype(jnp.float32))
    ds = p * (dp - delta)
    dsb = ds.astype(q.dtype)
    dq = (jnp.einsum("bnm,bmd->bnd", dsb, k,
                     preferred_element_type=jnp.float32)
          * scale).astype(q.dtype)
    dk = (jnp.einsum("bnm,bnd->bmd", dsb, q,
                     preferred_element_type=jnp.float32)
          * scale).astype(k.dtype)
    return dq, dk, dv


_xla_flash_core.defvjp(_xla_flash_fwd, _xla_flash_bwd)


def _relpos_block_k(k_h: int, k_w: int) -> int:
    """Largest row-aligned key block <= ~512 entries (block walks the key
    grid row by row so the decomposed bias slices cleanly)."""
    rows = 1
    while k_h % (rows * 2) == 0 and (rows * 2) * k_w <= 512:
        rows *= 2
    return rows * k_w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _xla_relpos_core(q, k, v, rel_h, rel_w, k_h, block_k):
    o, _ = _xla_fwd_pass(q, k, v, (rel_h, rel_w), block_k)
    return o


def _xla_relpos_fwd(q, k, v, rel_h, rel_w, k_h, block_k):
    o, lse = _xla_fwd_pass(q, k, v, (rel_h, rel_w), block_k)
    return o, (q, k, v, rel_h, rel_w, o, lse)


def _xla_relpos_bwd(k_h, block_k, res, do):
    """Blockwise FA-2 backward: probabilities are recomputed PER KEY BLOCK
    under lax.scan — peak transient is [BH, N, block_k], never the three
    [BH, N, N] f32 tensors (s, p, ds) the one-shot backward held (2.4 GB/
    layer at SAM-B b1 4096 tokens; the round-5 trace's b8 OOM source)."""
    q, k, v, rel_h, rel_w, o, lse = res
    bh, n, d = q.shape
    k_w = rel_w.shape[-1]
    rows = block_k // k_w
    nb = k_h // rows
    scale = d**-0.5
    qf = q.astype(jnp.float32) * scale
    dof = do.astype(jnp.float32)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)
    kb = k.reshape(bh, nb, block_k, d).transpose(1, 0, 2, 3)
    vb = v.reshape(bh, nb, block_k, d).transpose(1, 0, 2, 3)
    rhb = rel_h.astype(jnp.float32).reshape(
        bh, n, nb, rows).transpose(2, 0, 1, 3)
    rwf = rel_w.astype(jnp.float32)

    def body(carry, inp):
        dq_acc, drw_acc = carry
        kblk, vblk, rh = inp
        s = jnp.einsum("bnd,bmd->bnm", qf, kblk.astype(jnp.float32))
        s = (s.reshape(bh, n, rows, k_w) + rh[..., :, None]
             + rwf[:, :, None, :]).reshape(bh, n, block_k)
        p = jnp.exp(s - lse[..., None])                # [BH, N, block_k]
        dv_blk = jnp.einsum("bnm,bnd->bmd", p.astype(do.dtype), do,
                            preferred_element_type=jnp.float32
                            ).astype(v.dtype)
        dp = jnp.einsum("bnd,bmd->bnm", dof, vblk.astype(jnp.float32))
        ds = p * (dp - delta)
        ds4 = ds.reshape(bh, n, rows, k_w)
        drh_blk = jnp.sum(ds4, axis=-1)                # [BH, N, rows]
        drw_acc = drw_acc + jnp.sum(ds4, axis=-2)      # [BH, N, k_w]
        dsb = ds.astype(q.dtype)
        dq_acc = dq_acc + jnp.einsum("bnm,bmd->bnd", dsb, kblk,
                                     preferred_element_type=jnp.float32)
        dk_blk = (jnp.einsum("bnm,bnd->bmd", dsb, q,
                             preferred_element_type=jnp.float32)
                  * scale).astype(k.dtype)
        return (dq_acc, drw_acc), (dk_blk, dv_blk, drh_blk)

    init = (jnp.zeros((bh, n, d), jnp.float32),
            jnp.zeros((bh, n, k_w), jnp.float32))
    (dq_acc, drw_acc), (dk_s, dv_s, drh_s) = jax.lax.scan(
        body, init, (kb, vb, rhb))
    dq = (dq_acc * scale).astype(q.dtype)
    dk = dk_s.transpose(1, 0, 2, 3).reshape(bh, n, d)
    dv = dv_s.transpose(1, 0, 2, 3).reshape(bh, n, d)
    drh = drh_s.transpose(1, 2, 0, 3).reshape(bh, n, k_h).astype(rel_h.dtype)
    drw = drw_acc.astype(rel_w.dtype)
    return dq, dk, dv, drh, drw


_xla_relpos_core.defvjp(_xla_relpos_fwd, _xla_relpos_bwd)


def flash_attention_xla(q, k, v, block_k: int = 512):
    """Blockwise online-softmax attention in plain XLA, [B, H, N, d].

    Arbitrary sequence lengths: N that doesn't divide the key block (e.g.
    ViT's 197 = 14x14 patches + cls) is zero-padded to the next block
    multiple; padded KEY positions are masked to -inf inside the scan and
    the FA-2 backward recompute, and padded QUERY rows are sliced off (their
    cotangents are zero, so they contribute nothing to dk/dv)."""
    b, h, n, d = q.shape
    block_k = min(block_k, max(128, n))
    pad = (-n) % block_k
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    if pad:
        widths = ((0, 0), (0, pad), (0, 0))
        out = _xla_flash_core(jnp.pad(qf, widths), jnp.pad(kf, widths),
                              jnp.pad(vf, widths), block_k, n)[:, :n]
    else:
        out = _xla_flash_core(qf, kf, vf, block_k)
    return out.reshape(b, h, n, d)


def _plain_softmax_fwd(q, k, v):
    """One-shot softmax attention, [BH, N, D]: f32 scores stay a transient
    inside the fusion, probabilities hit HBM once in the compute dtype for
    the PV matmul, and the only residual is the [BH, N] logsumexp."""
    d = q.shape[-1]
    scale = d**-0.5
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnm,bmd->bnd", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    lse = (m + jnp.log(l))[..., 0]                    # [BH, N]
    return o, lse


@jax.custom_vjp
def _recompute_core(q, k, v):
    o, _ = _plain_softmax_fwd(q, k, v)
    return o


def _recompute_fwd(q, k, v):
    o, lse = _plain_softmax_fwd(q, k, v)
    return o, (q, k, v, o, lse)


def _recompute_bwd(res, do):
    # FA-2 einsum-recompute backward, shared with the scan flash path
    # (block_k is unused there; kv_len=None disables key masking)
    return _xla_flash_bwd(0, None, res, do)


_recompute_core.defvjp(_recompute_fwd, _recompute_bwd)


def attention_recompute_xla(q, k, v):
    """Exact softmax attention, [B, H, N, d], with a FlashAttention-2
    einsum-recompute backward and NO online-softmax scan.

    The short-sequence complement to :func:`flash_attention_xla`: at ViT's
    197 tokens the scan's per-block loop overhead loses to one big softmax
    (measured 0.355 vs 0.402 MFU, BENCH_PORTFOLIO vit_b16_224_train_flash),
    but plain autodiff attention SAVES the f32 [B,H,N,N] probability tensor
    as a residual — 238 MB/layer at b128, re-read by the backward (the
    round-5 ViT-B trace's dominant traffic). This path keeps the one-shot
    forward and stores only (q, k, v, o, lse), recomputing probabilities in
    the backward as plain MXU einsums. Exact vs autodiff attention to f32
    tolerance (tests/test_flash_attention.py)."""
    b, h, n, d = q.shape
    o = _recompute_core(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                        v.reshape(b * h, n, d))
    return o.reshape(b, h, n, d)


def flash_attention_relpos_xla(q, k, v, rel_h, rel_w):
    """Blockwise online-softmax attention with SAM's decomposed rel-pos
    bias, in plain XLA. Same contract as flash_attention_relpos."""
    bh, n, d = q.shape
    k_h, k_w = rel_h.shape[-1], rel_w.shape[-1]
    assert k_h * k_w == n, (rel_h.shape, rel_w.shape, n)
    return _xla_relpos_core(q, k, v, rel_h, rel_w, k_h,
                            _relpos_block_k(k_h, k_w))
