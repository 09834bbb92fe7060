"""Ring attention: exact attention over sequence shards (context parallelism).

SURVEY.md §2.4 lists SP/CP & ring attention as explicitly absent from the
reference (its longest sequence — the SAM encoder's 64x64=4096 tokens,
reference simpleAICV/interactive_segmentation/models/segment_anything/
image_encoder.py:32-80 — fits one device). This module is the beyond-parity
TPU-native capability for when it doesn't: sequences sharded over a mesh
axis, with attention computed EXACTLY (not windowed) while no device ever
holds more than its own KV shard.

The TPU shape of the algorithm:

  * Q stays put, sharded over the ``sp`` axis; the K/V shards rotate around
    the ring with ``lax.ppermute`` (neighbour ICI hops, S-1 of them);
  * each hop contributes one [N_local x N_local] score block, folded into a
    running **online softmax** (running max ``m``, denominator ``l``,
    unnormalised output ``o`` — the FlashAttention recurrence, so the result
    is exact regardless of visit order);
  * the hop loop is a ``lax.scan`` (one compiled program; compute of block t
    overlaps the ppermute of block t+1 in XLA's schedule);
  * backward is plain autodiff through the scan — ``ppermute``'s transpose
    is the reverse ring, so the gradient pass is itself a ring pipeline.

Composes with data parallelism (batch over 'data', sequence over 'sp') and
with the head dim replicated or tensor-sharded by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention_local", "make_ring_attention"]


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _pvary(x, axis):
    """Mark ``x`` device-varying over ``axis``; no-op if it already is."""
    for name, args in (("pcast", ((axis,),)), ("pvary", ((axis,),))):
        fn = getattr(lax, name, None)
        if fn is not None:
            try:
                if name == "pcast":
                    return fn(x, (axis,), to="varying")
                return fn(x, (axis,))
            except ValueError:
                return x  # already varying over this axis
    return x


def ring_attention_local(q, k, v, *, axis: str, axis_size: int,
                         scale: float | None = None):
    """Exact softmax attention over ring-sharded KV. Call INSIDE shard_map.

    q, k, v: [B, H, N_local, D] — this device's sequence shard.
    Returns [B, H, N_local, D], the exact attention output as if computed
    over the full N = axis_size * N_local sequence.
    """
    s = axis_size
    d = q.shape[-1]
    scale = (d**-0.5) if scale is None else scale
    qf = jnp.asarray(q, jnp.float32) * scale
    perm = _ring_perm(s)

    def hop(carry, _):
        o, m, l, kc, vc = carry
        scores = jnp.einsum("bhnd,bhmd->bhnm", qf,
                            jnp.asarray(kc, jnp.float32))
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("bhnm,bhmd->bhnd", p,
                                   jnp.asarray(vc, jnp.float32))
        kc = lax.ppermute(kc, axis, perm)
        vc = lax.ppermute(vc, axis, perm)
        return (o, m_new, l, kc, vc), None

    # seed with the local block (keeps every carry leaf's varying-axes type
    # identical to the hop outputs — required by scan-under-shard_map)
    scores0 = jnp.einsum("bhnd,bhmd->bhnm", qf, jnp.asarray(k, jnp.float32))
    m0 = jnp.max(scores0, axis=-1, keepdims=True)
    p0 = jnp.exp(scores0 - m0)
    l0 = jnp.sum(p0, axis=-1, keepdims=True)
    o0 = jnp.einsum("bhnm,bhmd->bhnd", p0, jnp.asarray(v, jnp.float32))
    k1 = lax.ppermute(_pvary(k, axis), axis, perm)
    v1 = lax.ppermute(_pvary(v, axis), axis, perm)
    (o, _, l, _, _), _ = lax.scan(
        hop, (_pvary(o0, axis), _pvary(m0, axis), _pvary(l0, axis), k1, v1),
        None, length=s - 1)
    return (o / l).astype(q.dtype)


def make_ring_attention(mesh: Mesh, *, axis: str = "sp",
                        data_axis: str | None = "data",
                        scale: float | None = None):
    """jit-able ``fn(q, k, v) -> out`` for [B, H, N, D] arrays with the batch
    sharded over ``data_axis`` (optional) and the sequence over ``axis``."""
    s = mesh.shape[axis]
    spec = P(data_axis, None, axis, None)
    local = functools.partial(ring_attention_local, axis=axis, axis_size=s,
                              scale=scale)
    return jax.shard_map(lambda q, k, v: local(q, k, v), mesh=mesh,
                         in_specs=(spec, spec, spec), out_specs=spec)
