"""GPipe-style pipeline parallelism as SPMD collectives.

The reference framework has no pipeline parallelism at all (its scaling story
is DDP only — reference tools/train_classification_model.py:51-94); this module
is a beyond-parity capability for models whose layer stack does not fit one
chip (SAM-H / ViT-H class). It is written the TPU way: instead of point-to-point
sends between worker processes (the GPU idiom), the whole pipeline is ONE
SPMD program inside ``jax.shard_map`` over a ``pipe`` mesh axis —

  * every device holds one *stage* (a contiguous run of identical-width
    blocks), as a leading-axis shard of a stacked parameter tree;
  * microbatches ride around the ring with ``lax.ppermute`` (ICI neighbour
    hops), one hop per pipeline tick;
  * the tick loop is a ``lax.scan`` (compiled once, static trip count
    ``n_micro + n_stages - 1``: the classic GPipe fill+drain schedule);
  * the backward pass is plain ``jax.grad`` through the scan — the transpose
    of ``ppermute`` is the reverse ring, so autodiff derives the backward
    pipeline schedule for free, and each device ends up holding exactly the
    gradient of its own stage's parameters (no gradient collective over
    ``pipe`` is needed, mirroring the forward's zero-copy weight layout).

Composes with data parallelism: the mesh is ``('data', 'pipe')``; the batch is
sharded over ``data``, the stage stack over ``pipe``, and the loss is
``pmean``-ed over ``data`` inside the same shard_map.

Restrictions (inherent to ring pipelining, documented rather than hidden):
the stage function must map activations of one fixed shape to the same shape
(true for transformer blocks), and ``n_stages`` must equal the ``pipe`` axis
size. Bubble fraction is the usual (S-1)/(M+S-1); pick n_micro >= 4*stages.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def make_pipeline_mesh(n_pipe: int, devices=None) -> Mesh:
    """('data', 'pipe') mesh with the trailing ``n_pipe`` ring on the minor
    (fastest-ICI) axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    assert n % n_pipe == 0, f"{n} devices not divisible by pipe={n_pipe}"
    return Mesh(devices.reshape(n // n_pipe, n_pipe), ("data", "pipe"))


def stack_stage_params(per_stage_params: list[PyTree], mesh: Mesh) -> PyTree:
    """Stack per-stage parameter trees on a new leading axis and shard that
    axis over ``pipe`` (each device materialises only its own stage)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)
    sh = NamedSharding(mesh, P("pipe"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def _ring_perm(n: int) -> list[tuple[int, int]]:
    return [(i, (i + 1) % n) for i in range(n)]


def _pvary(x, axis):
    """Mark ``x`` as device-varying over ``axis`` (no-op if already varying
    or on jax versions without the vma type system)."""
    for name in ("pcast", "pvary"):
        fn = getattr(lax, name, None)
        if fn is not None:
            try:
                if name == "pcast":
                    return fn(x, (axis,), to="varying")
                return fn(x, (axis,))
            except ValueError:
                return x  # already varying over this axis
    return x


def pipeline_forward(
    stage_fn: Callable[[PyTree, jax.Array], jax.Array],
    params_local: PyTree,
    x_micro: jax.Array,
    *,
    n_stages: int,
    axis: str = "pipe",
    remat: bool = False,
) -> jax.Array:
    """Run the fill+drain microbatch pipeline. Call INSIDE shard_map.

    params_local: this device's stage shard, leaves shaped [1, ...].
    x_micro: [M, micro_batch, ...] microbatches (replicated over ``axis``;
        only stage 0 reads them).
    Returns [M, micro_batch, ...] outputs, replicated over ``axis``.
    """
    idx = lax.axis_index(axis)
    s = n_stages
    m = x_micro.shape[0]
    p_mine = jax.tree.map(lambda a: a[0], params_local)
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def tick(carry, t):
        buf, outs = carry
        # stage 0 injects microbatch t (clamped during the drain phase);
        # everyone else consumes what arrived over the ring last tick.
        mb = lax.dynamic_index_in_dim(x_micro, jnp.clip(t, 0, m - 1), 0,
                                      keepdims=False)
        inp = jnp.where(idx == 0, mb, buf)
        y = fn(p_mine, inp)
        # the last stage surfaces microbatch t-(S-1) at tick t
        o_t = t - (s - 1)
        o_clamped = jnp.clip(o_t, 0, m - 1)
        valid = jnp.logical_and(idx == s - 1, o_t >= 0)
        prev = lax.dynamic_index_in_dim(outs, o_clamped, 0, keepdims=False)
        outs = lax.dynamic_update_index_in_dim(
            outs, jnp.where(valid, y, prev), o_clamped, 0)
        buf = lax.ppermute(y, axis, _ring_perm(s))
        return (buf, outs), None

    # the scan carry becomes device-varying after the first ppermute, so the
    # initial carry must already carry the 'varying' vma type (shard_map
    # scan-vma rule).
    buf0 = _pvary(jnp.zeros_like(x_micro[0]), axis)
    outs0 = _pvary(jnp.zeros_like(x_micro), axis)
    (_, outs), _ = lax.scan(tick, (buf0, outs0), jnp.arange(m + s - 1))
    # only the last stage holds real outputs; psum broadcasts them ring-wide
    # (its transpose re-routes output cotangents to the last stage).
    mask = (idx == s - 1).astype(outs.dtype)
    return lax.psum(outs * mask, axis)


def make_pipeline_loss_fn(
    stage_fn: Callable[[PyTree, jax.Array], jax.Array],
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    mesh: Mesh,
    *,
    n_micro: int,
    remat: bool = False,
):
    """Build loss(stacked_params, x, y) -> replicated scalar, jit/grad-able.

    x: [B, ...] global batch (sharded over 'data'); it is reshaped to
    [n_micro, B_local/n_micro, ...] microbatches per data-shard.
    loss_fn(y_pred, y_true) must return a per-microbatch mean scalar.
    """
    n_stages = mesh.shape["pipe"]

    def local(params, x, y):
        xm = x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])
        ym = y.reshape((n_micro, y.shape[0] // n_micro) + y.shape[1:])
        out = pipeline_forward(stage_fn, params, xm, n_stages=n_stages,
                               remat=remat)
        loss = jnp.mean(jax.vmap(loss_fn)(out, ym))
        return lax.pmean(loss, "data")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("pipe"), P("data"), P("data")),
        out_specs=P(),
    )


def make_pipeline_train_step(
    stage_fn,
    loss_fn,
    optimizer,
    mesh: Mesh,
    *,
    n_micro: int,
    remat: bool = False,
):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) with
    dp x pp sharding. Gradients for each stage never leave its device;
    only the 'data'-axis mean is a collective."""
    pipe_loss = make_pipeline_loss_fn(stage_fn, loss_fn, mesh,
                                      n_micro=n_micro, remat=remat)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(pipe_loss)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
