"""Mixture-of-Experts FFN with expert parallelism, the TPU way.

Beyond-parity capability (the reference framework — see reference
simpleAICV/classification/backbones/vit.py:174-330 — has dense FFNs only):
a GShard/Switch-style token-routed MoE layer designed for the MXU and for
SPMD expert parallelism:

  * **gather-free dispatch**: token->expert routing is expressed entirely as
    one-hot matmuls/einsums (dispatch tensor [T,E,Cap]), never as gathers or
    scatters — on this TPU stack per-element gathers loop-lower (measured,
    ROADMAP.md round-3; same idiom as data/device_augment.py);
  * **static shapes**: expert capacity is a trace-time constant
    ``ceil(top_k*T/E)*capacity_factor``, so the XLA program is fixed-shape
    regardless of routing decisions; overflow tokens are dropped (their
    combine weight is zero) exactly as in GShard/Switch;
  * **expert parallelism via sharding, not message passing**: expert weights
    are a leading-axis [E, ...] stack; shard that axis over a mesh dim
    (``expert_param_sharding``) and XLA's SPMD partitioner turns the
    dispatch/combine einsums into the all_to_all pattern over ICI — the
    training code contains zero explicit collectives;
  * batched expert compute: one ``ecd,edf->ecf`` einsum runs every expert's
    FFN as a single MXU batch, with f32 accumulation on bf16 operands.

Router math (softmax probs, top-k masking, position-in-expert cumsum,
auxiliary load-balancing loss E*mean_e(frac_tokens_e * mean_prob_e)) follows
the Switch-Transformer/GShard formulation.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import Dtype, dtype_field

__all__ = [
    "top_k_dispatch", "MoEFeedForward", "expert_param_sharding",
    "moe_aux_loss",
]


def top_k_dispatch(probs, capacity: int, top_k: int):
    """Gather-free top-k routing tensors.

    probs: [T, E] router softmax (f32).
    Returns (dispatch [T,E,Cap] 0/1, combine [T,E,Cap] gated, aux_loss scalar).
    Tokens routed past an expert's capacity get zero dispatch/combine weight
    (dropped, residual-passthrough is the caller's choice). For top_k > 1 the
    kept gates are renormalised over the selected experts (GShard top-2).
    """
    t, e = probs.shape
    f32 = probs.dtype

    masks, gates = [], []
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        m = jax.nn.one_hot(idx, e, dtype=f32)  # [T,E]
        masks.append(m)
        gates.append(jnp.sum(probs * m, axis=-1))  # raw prob of the choice
        p = p * (1.0 - m)

    # aux load-balance loss from the top-1 assignment (Switch eq. 4-6)
    frac_tokens = jnp.mean(masks[0], axis=0)  # [E]
    mean_prob = jnp.mean(probs, axis=0)  # [E]
    aux = e * jnp.sum(frac_tokens * mean_prob)

    if top_k > 1:
        denom = sum(gates)
        gates = [g / jnp.maximum(denom, 1e-9) for g in gates]

    # position of each token inside its expert's buffer: tokens earlier in
    # the batch (and earlier routing choices) fill slots first
    dispatch = jnp.zeros((t, e, capacity), f32)
    combine = jnp.zeros((t, e, capacity), f32)
    offset = jnp.zeros((e,), f32)
    for m, g in zip(masks, gates):
        pos_in_e = jnp.cumsum(m, axis=0) - m + offset  # [T,E]
        pos = jnp.sum(pos_in_e * m, axis=-1)  # [T]
        keep = jnp.sum(m, axis=-1) * (pos < capacity)  # [T]
        slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                              dtype=f32)  # [T,Cap]
        d = (keep[:, None] * m)[:, :, None] * slot[:, None, :]
        dispatch = dispatch + d
        combine = combine + g[:, None, None] * d
        offset = offset + jnp.sum(m, axis=0)

    return dispatch, combine, aux


class MoEFeedForward(nn.Module):
    """Drop-in MoE replacement for the ViT ``FeedForward`` (same [B,N,C] ->
    [B,N,C] contract). Expert weights are [E, ...] stacks; the auxiliary
    load-balancing loss is sown into the ``moe_losses`` collection
    (``apply(..., mutable=["moe_losses"])`` + :func:`moe_aux_loss`)."""

    hidden: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    # ST-MoE router z-loss weight (mean logsumexp(logits)^2): keeps router
    # logits small so the f32 softmax stays well-conditioned under bf16
    # activations; 0 disables, 1e-3 is the paper default
    router_z_weight: float = 1e-3
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.top_k <= self.num_experts, (self.top_k, self.num_experts)
        b, n, c = x.shape
        t = b * n
        e = self.num_experts
        cap = max(1, int(math.ceil(self.top_k * t / e) *
                         self.capacity_factor))

        xt = x.reshape(t, c)
        router_w = self.param("router", nn.initializers.truncated_normal(0.02),
                              (c, e), jnp.float32)
        logits = jnp.asarray(xt, jnp.float32) @ router_w
        probs = jax.nn.softmax(logits, axis=-1)
        dispatch, combine, aux = top_k_dispatch(probs, cap, self.top_k)
        if self.router_z_weight > 0.0:
            z = jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1)))
            aux = aux + self.router_z_weight * z
        self.sow("moe_losses", "aux", aux,
                 init_fn=lambda: jnp.zeros((), jnp.float32),
                 reduce_fn=lambda a, b: a + b)

        wi = self.param("wi", nn.initializers.lecun_normal(
            batch_axis=(0,)), (e, c, self.hidden), jnp.float32)
        bi = self.param("bi", nn.initializers.zeros, (e, 1, self.hidden),
                        jnp.float32)
        wo = self.param("wo", nn.initializers.lecun_normal(
            batch_axis=(0,)), (e, self.hidden, c), jnp.float32)
        bo = self.param("bo", nn.initializers.zeros, (e, 1, c), jnp.float32)

        cd = self.dtype
        # dispatch/combine einsums: the SPMD partitioner turns these into
        # all_to_all over the expert-sharded axis when wi/wo are sharded
        expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(cd),
                               xt.astype(cd),
                               preferred_element_type=jnp.float32)
        h = jnp.einsum("ecd,edf->ecf", expert_in.astype(cd), wi.astype(cd),
                       preferred_element_type=jnp.float32) + bi
        h = nn.gelu(h, approximate=False)
        out = jnp.einsum("ecf,efd->ecd", h.astype(cd), wo.astype(cd),
                         preferred_element_type=jnp.float32) + bo
        yt = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32),
                        out.astype(jnp.float32))
        return yt.reshape(b, n, c).astype(x.dtype)


def expert_param_sharding(mesh: Mesh, params, axis: str = "fsdp",
                          fallback=None):
    """Shard every MoE expert stack (param names router/wi/bi/wo/bo under a
    ``Moe``-flavoured module) on its leading [E] dim over ``axis``; other
    leaves use ``fallback`` (replicated by default)."""
    rep = NamedSharding(mesh, P())
    fallback = fallback if fallback is not None else (lambda _: rep)
    n_ax = mesh.shape[axis]

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in ("wi", "bi", "wo", "bo") and v.shape[0] % n_ax == 0:
                out[k] = NamedSharding(mesh, P(axis))
            else:
                out[k] = fallback(v)
        return out

    return walk(params)


def moe_aux_loss(mutations) -> jax.Array:
    """Sum of all sown MoE aux losses (pass ``apply``'s mutated collections)."""
    col = mutations.get("moe_losses", {}) if mutations else {}
    leaves = jax.tree.leaves(col)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return sum(jnp.sum(jnp.asarray(leaf)) for leaf in leaves)
