"""ViT with Mixture-of-Experts FFN blocks (beyond-parity; the reference's
ViT — simpleAICV/classification/backbones/vit.py:174-330 — is dense-only).

Every second encoder block swaps the dense FeedForward for a token-routed
``MoEFeedForward`` (parallel/moe.py): GShard-style interleaving, which keeps
half the blocks dense as routing anchors. Scale the parameter count E-fold at
~constant per-token FLOPs; shard the expert stacks over a mesh axis with
``expert_param_sharding`` for SPMD expert parallelism.

The per-layer auxiliary load-balance losses are sown into the ``moe_losses``
collection: ``apply(vars, x, train, mutable=["moe_losses"])`` then
``moe_aux_loss(muts)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ...parallel.moe import MoEFeedForward
from ..common import DropPath, Dtype, cdtype, dtype_field
from .vit import MultiHeadAttention, TransformerEncoderLayer

__all__ = ["ViTMoE", "vit_moe_tiny_patch16", "vit_moe_small_patch16",
           "vit_moe_base_patch16"]


class MoETransformerEncoderLayer(nn.Module):
    head_nums: int
    feedforward_ratio: int = 4
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    use_flash_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = MultiHeadAttention(self.head_nums, self.dropout_prob,
                               self.use_flash_attention,
                               name="attn")(h.astype(cdtype()), train)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = MoEFeedForward(int(c * self.feedforward_ratio),
                           num_experts=self.num_experts, top_k=self.top_k,
                           capacity_factor=self.capacity_factor,
                           name="moe_mlp")(h.astype(cdtype()), train)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        return x


class ViTMoE(nn.Module):
    patch_size: int
    embedding_planes: int
    block_nums: int
    head_nums: int
    feedforward_ratio: int = 4
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    moe_every: int = 2  # MoE FFN in blocks i with i % moe_every == 1
    image_size: int = 224
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    global_pool: bool = False
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    use_flash_attention: bool = False
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        c = self.embedding_planes
        x = nn.Conv(c, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=cdtype(),
                    param_dtype=jnp.float32, name="patch_embedding")(x)
        x = x.reshape(b, -1, c)

        cls_token = self.param("cls_token",
                               nn.initializers.normal(stddev=1e-6), (1, 1, c),
                               jnp.float32)
        n_tokens = (self.image_size // self.patch_size)**2 + 1
        pos_embed = self.param("position_encoding",
                               nn.initializers.truncated_normal(0.02),
                               (1, n_tokens, c), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, c)).astype(x.dtype), x],
            axis=1)
        x = x + pos_embed.astype(x.dtype)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)

        dense_cls, moe_cls = TransformerEncoderLayer, MoETransformerEncoderLayer
        if self.use_gradient_checkpoint:
            dense_cls = nn.remat(dense_cls, static_argnums=(2,))
            moe_cls = nn.remat(moe_cls, static_argnums=(2,))
        for i in range(self.block_nums):
            dpp = (0.0 if self.drop_path_prob == 0.0 else
                   self.drop_path_prob * i / max(self.block_nums - 1, 1))
            if i % self.moe_every == 1:
                x = moe_cls(self.head_nums, self.feedforward_ratio,
                            self.num_experts, self.top_k,
                            self.capacity_factor, self.dropout_prob, dpp,
                            self.use_flash_attention,
                            name=f"blocks_{i}")(x, train)
            else:
                x = dense_cls(self.head_nums, self.feedforward_ratio,
                              self.dropout_prob, dpp,
                              self.use_flash_attention,
                              name=f"blocks_{i}")(x, train)

        if self.global_pool:
            x = jnp.mean(x[:, 1:, :].astype(jnp.float32), axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
            x = x[:, 0].astype(jnp.float32)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.truncated_normal(2e-5),
                     name="fc")(x)
        return x


@BACKBONES.register()
def vit_moe_tiny_patch16(**kwargs):
    return ViTMoE(patch_size=16, embedding_planes=192, block_nums=12,
                  head_nums=3, **kwargs)


@BACKBONES.register()
def vit_moe_small_patch16(**kwargs):
    return ViTMoE(patch_size=16, embedding_planes=384, block_nums=12,
                  head_nums=6, **kwargs)


@BACKBONES.register()
def vit_moe_base_patch16(**kwargs):
    return ViTMoE(patch_size=16, embedding_planes=768, block_nums=12,
                  head_nums=12, **kwargs)
