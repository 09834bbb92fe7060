"""Pipeline-parallel execution of the registry ViT family.

Glue that makes ``parallel/pipeline.py`` consumable for real models: take any
``ViT``/backbone variables (vit_base..vit_giant, sapiens — reference parity
models from models/backbones/vit.py), split the encoder blocks into
``pipe``-many stages, and run patch-embed -> [pipelined blocks] -> head where
the block stack executes as the GPipe ppermute ring. Embed and head are a
few percent of the FLOPs, so they run replicated outside the ``shard_map``
(sharding propagation handles the 'data' axis); each device materialises
only its own stage's block weights — the enabling layout for ViT-H/SAM-H
class models that do not fit one chip.

The embed/head math here is a restatement of ``ViT.__call__``
(models/backbones/vit.py:124-167) over the same parameter tree; equivalence
with ``model.apply`` is pinned by tests/test_pipeline_vit.py, so drift fails
CI. Restrictions: eval-mode blocks (dropout/drop-path zero — their per-block
rng threading is not worth the schedule complexity yet) and
``block_nums % n_stages == 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.backbones.vit import TransformerEncoderLayer, ViT
from ..models.common import cdtype
from .pipeline import pipeline_forward, stack_stage_params

__all__ = ["vit_stage_params", "make_vit_pipeline_apply"]


def vit_stage_params(params, n_stages: int, mesh: Mesh):
    """[S]-stacked, 'pipe'-sharded block parameters; leaves [S, L/S, ...]."""
    n_blocks = sum(1 for k in params if k.startswith("blocks_"))
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    lps = n_blocks // n_stages
    per_stage = []
    for s in range(n_stages):
        blocks = [params[f"blocks_{i}"] for i in range(s * lps, (s + 1) * lps)]
        per_stage.append(jax.tree.map(lambda *xs: jnp.stack(xs), *blocks))
    return stack_stage_params(per_stage, mesh)


def _vit_embed(model: ViT, params, x):
    """Patch conv + cls token + pos embed (ViT.__call__:124-145, eval)."""
    p, c = model.patch_size, model.embedding_planes
    b, h, w, _ = x.shape
    k = params["patch_embedding"]["kernel"]  # [p, p, 3, C]
    xb = x.astype(cdtype()).reshape(b, h // p, p, w // p, p, x.shape[-1])
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * x.shape[-1])
    tok = xb @ k.reshape(-1, c).astype(cdtype())
    tok = tok + params["patch_embedding"]["bias"].astype(tok.dtype)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, c)).astype(tok.dtype)
    tok = jnp.concatenate([cls, tok], axis=1)
    return tok + params["position_encoding"].astype(tok.dtype)


def _layer_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def _vit_head(model: ViT, params, x):
    """Final norm + cls/global-pool + fc (ViT.__call__:157-167)."""
    if model.global_pool:
        x = jnp.mean(x[:, 1:, :].astype(jnp.float32), axis=1)
        x = _layer_norm(params["norm"], x)
    else:
        x = _layer_norm(params["norm"], x)[:, 0]
    return x @ params["fc"]["kernel"] + params["fc"]["bias"]


def make_vit_pipeline_apply(model: ViT, mesh: Mesh, *, n_micro: int,
                            axis: str = "pipe", data_axis: str | None = None,
                            remat: bool = False):
    """Build ``apply(params, stage_params, x) -> logits`` running the block
    stack as a fill+drain microbatch pipeline over ``mesh.shape[axis]``
    stages. ``params`` is the full (replicated) variables['params'] tree —
    embed/head weights are read from it; ``stage_params`` comes from
    :func:`vit_stage_params`. With ``data_axis`` set, the microbatch dim is
    additionally sharded over it (dp x pp on one mesh: each data-shard runs
    its own fill+drain ring over its slice of every microbatch)."""
    n_stages = mesh.shape[axis]
    block = TransformerEncoderLayer(model.head_nums, model.feedforward_ratio,
                                    0.0, 0.0, model.use_flash_attention)

    def stage_fn(p, x):
        def body(c, pl):
            return block.apply({"params": pl}, c, False), None
        x, _ = lax.scan(body, x, p)
        return x

    xspec = P(None, data_axis) if data_axis else P()
    pipe = jax.shard_map(
        functools.partial(pipeline_forward, stage_fn, n_stages=n_stages,
                          axis=axis, remat=remat),
        mesh=mesh,
        in_specs=(P(axis), xspec),
        out_specs=xspec,
    )

    def apply_fn(params, stage_params, x):
        tok = _vit_embed(model, params, x)
        b = tok.shape[0]
        assert b % n_micro == 0, (b, n_micro)
        xm = tok.reshape((n_micro, b // n_micro) + tok.shape[1:])
        out = pipe(stage_params, xm)
        out = out.reshape((b,) + tok.shape[1:])
        return _vit_head(model, params, out)

    return apply_fn
