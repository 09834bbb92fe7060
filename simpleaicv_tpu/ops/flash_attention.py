"""Flash attention as a Pallas TPU kernel.

The reference scales attention architecturally (SAM windowed attention with 4
global layers, optional xformers memory-efficient attention per its ReadMe env
notes — SURVEY.md §5); the TPU-native answer is an online-softmax blocked
kernel: O(N) memory, softmax fused with both matmuls on the MXU, f32
accumulators over bf16 operands.

Used by the ViT backbone / SAM global-attention layers when
``use_flash_attention`` is set; the einsum path remains the reference
implementation for equivalence tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
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


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None):
    """q/k/v: [B, H, N, d] -> [B, H, N, d]. N must be a multiple of the block
    sizes (pad beforehand; ViT/SAM token counts are static)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, n, d = q.shape
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0, (n, block_q, block_k)
    scale = d**-0.5

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def reference_attention(q, k, v):
    """Plain softmax attention (f32 softmax) for equivalence tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
