"""On-device bipartite matching via the auction algorithm (Bertsekas).

The reference's DETR losses match queries to ground truths with scipy
``linear_sum_assignment`` on host (simpleAICV/detection/losses.py:1050-1079).
Under SPMD a host callback serialises through one device, so this provides a
fully jittable alternative: a synchronous (Jacobi) forward auction run as a
``lax.while_loop`` — fixed shapes, no host transfer, runs sharded.

Design notes (validated against scipy on random + adversarial costs):
  * persons = ground truths (few), objects = queries (many), so the problem
    is asymmetric; forward auction from ALL-ZERO initial prices converges to
    an assignment within ``n_gt * eps`` of optimal. Carrying prices across
    ε-scaling phases is NOT sound for asymmetric problems (stale inflated
    prices on unowned objects break the optimality bound), so a single phase
    with a small ε is used — with many more queries than gts contention is
    low and convergence takes a handful of iterations.
  * ``max_iters`` caps the pathological near-duplicate-gt case (crowds),
    where iterations can grow as cost-range/ε; hitting the cap leaves the
    contested gts unmatched (−1) for that step — graceful degradation for a
    training-target heuristic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def auction_match(cost: jnp.ndarray, valid_m: jnp.ndarray, *,
                  eps: float | None = None,
                  max_iters: int = 2000) -> jnp.ndarray:
    """cost [Q,M] (min-cost), valid_m [M] bool -> per-query matched gt index
    [Q] int32, −1 for unmatched queries. Jittable / vmappable."""
    q, m = cost.shape
    cost = cost.astype(jnp.float32)
    valid_m = valid_m.astype(bool)
    # values: person i (gt) gets v[i,j] from object j (query)
    v = -jnp.where(jnp.isfinite(cost), cost, 1e8).T  # [M,Q]
    v = jnp.where(valid_m[:, None], v, _NEG)

    if eps is None:
        span = jnp.maximum(
            jnp.max(jnp.where(valid_m[:, None], jnp.abs(v), 0.0)), 1.0)
        eps_val = jnp.maximum(span * 1e-4, 1e-3)
    else:
        eps_val = jnp.float32(eps)
    obj_ids = jnp.arange(q, dtype=jnp.int32)

    def cond(state):
        assign_i, _, _, it = state
        return jnp.any(valid_m & (assign_i < 0)) & (it < max_iters)

    def body(state):
        assign_i, owner_j, prices, it = state
        bidder = valid_m & (assign_i < 0)                   # [M]
        net = v - prices[None, :]                           # [M,Q]
        best_val = jnp.max(net, axis=1)
        best_j = jnp.argmax(net, axis=1).astype(jnp.int32)
        one_hot_best = jax.nn.one_hot(best_j, q, dtype=bool)
        second_val = jnp.max(jnp.where(one_hot_best, _NEG, net), axis=1)
        bid = prices[best_j] + (best_val - second_val) + eps_val  # [M]
        # each bidder bids on exactly one object -> winners are distinct
        bid_mat = jnp.where(one_hot_best & bidder[:, None],
                            bid[:, None], _NEG)             # [M,Q]
        win_bid = jnp.max(bid_mat, axis=0)                  # [Q]
        win_i = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        got = win_bid > _NEG / 2
        prices = jnp.where(got, win_bid, prices)
        # previous owners of re-auctioned objects lose their assignment
        lost_gt = jnp.where(got & (owner_j >= 0), owner_j, m)
        assign_i = assign_i.at[lost_gt].set(-1, mode="drop")
        owner_j = jnp.where(got, win_i, owner_j)
        new_q = jnp.where(got, obj_ids, -1)
        assign_i = assign_i.at[jnp.where(got, win_i, m)].set(
            new_q, mode="drop")
        return assign_i, owner_j, prices, it + 1

    assign_i = jnp.full((m,), -1, jnp.int32)   # gt -> query
    owner_j = jnp.full((q,), -1, jnp.int32)    # query -> gt
    prices = jnp.zeros((q,), jnp.float32)
    assign_i, owner_j, _, _ = jax.lax.while_loop(
        cond, body, (assign_i, owner_j, prices, jnp.int32(0)))
    # if max_iters hit, drop gts still marked unassigned from owner_j too
    orphaned = (assign_i < 0)
    owner_valid = (owner_j >= 0) & ~orphaned[jnp.clip(owner_j, 0, m - 1)]
    return jnp.where(owner_valid, owner_j, -1)


def auction_match_batch(cost: jnp.ndarray, valid_m: jnp.ndarray,
                        **kwargs) -> jnp.ndarray:
    """cost [B,Q,M], valid_m [B,M] -> [B,Q] matched gt index (−1)."""
    return jax.vmap(lambda c, v: auction_match(c, v, **kwargs))(cost, valid_m)
