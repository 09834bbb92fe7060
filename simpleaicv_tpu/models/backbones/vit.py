"""ViT backbone family (parity: reference
simpleAICV/classification/backbones/vit.py:174-330 — pre-norm ViT with cls
token, learned pos-embed, optional global-pool head; variants base/large/huge
p16/p14 + sapiens 0.3b-2.0b).

TPU-first: fused qkv projection, attention via einsum with f32 softmax on bf16
operands (MXU-friendly), remat per encoder layer for ``use_gradient_checkpoint``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.registry import BACKBONES
from ..common import DropPath, Dtype, cdtype, dtype_field

__all__ = [
    "ViT", "vit_base_patch16", "vit_large_patch16", "vit_huge_patch14",
    "vit_small_patch14", "vit_base_patch14", "vit_large_patch14",
    "vit_giant_patch14", "sapiens_0_3b", "sapiens_0_6b", "sapiens_1_0b",
    "sapiens_2_0b",
]


class MultiHeadAttention(nn.Module):
    head_nums: int
    dropout_prob: float = 0.0
    use_flash_attention: bool = False
    use_recompute_attention: bool = False
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        head_dim = c // self.head_nums
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.head_nums, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_flash_attention and self.dropout_prob == 0.0:
            # plain-XLA online softmax (Pallas doesn't lower on the
            # production TPU stack — ops/flash_attention.py)
            from ...ops.flash_attention import flash_attention_xla
            out = flash_attention_xla(q.transpose(0, 2, 1, 3),
                                      k.transpose(0, 2, 1, 3),
                                      v.transpose(0, 2, 1, 3))
            out = out.transpose(0, 2, 1, 3)
        elif self.use_recompute_attention and self.dropout_prob == 0.0:
            # one-shot softmax forward + FA-2 einsum-recompute backward:
            # drops the f32 [B,H,N,N] probability residual without the
            # scan overhead flash pays at short sequences
            from ...ops.flash_attention import attention_recompute_xla
            out = attention_recompute_xla(q.transpose(0, 2, 1, 3),
                                          k.transpose(0, 2, 1, 3),
                                          v.transpose(0, 2, 1, 3))
            out = out.transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn * (head_dim**-0.5)
            attn = nn.softmax(attn, axis=-1)
            if self.dropout_prob > 0.0:
                attn = nn.Dropout(self.dropout_prob,
                                  deterministic=not train)(attn)
            attn = attn.astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, n, c).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        if self.dropout_prob > 0.0:
            out = nn.Dropout(self.dropout_prob, deterministic=not train)(out)
        return out


class FeedForward(nn.Module):
    hidden: int
    dropout_prob: float = 0.0
    dtype: Dtype = dtype_field()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x


class TransformerEncoderLayer(nn.Module):
    head_nums: int
    feedforward_ratio: int = 4
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    use_flash_attention: bool = False
    use_recompute_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = MultiHeadAttention(self.head_nums, self.dropout_prob,
                               self.use_flash_attention,
                               self.use_recompute_attention,
                               name="attn")(h.astype(cdtype()), train)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = FeedForward(int(c * self.feedforward_ratio), self.dropout_prob,
                        name="mlp")(h.astype(cdtype()), train)
        x = x + DropPath(self.drop_path_prob)(h.astype(x.dtype), train)
        return x


class ViT(nn.Module):
    patch_size: int
    embedding_planes: int
    block_nums: int
    head_nums: int
    feedforward_ratio: int = 4
    image_size: int = 224
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    global_pool: bool = False
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    use_flash_attention: bool = False
    use_recompute_attention: bool = False

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
            [jnp.broadcast_to(cls_token, (b, 1, c)).astype(x.dtype), x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)

        layer_cls = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            layer_cls = nn.remat(layer_cls, static_argnums=(2,))
        for i in range(self.block_nums):
            dpp = (0.0 if self.drop_path_prob == 0.0 else
                   self.drop_path_prob * i / max(self.block_nums - 1, 1))
            x = layer_cls(self.head_nums, self.feedforward_ratio,
                          self.dropout_prob, dpp, self.use_flash_attention,
                          self.use_recompute_attention,
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


def _vit(patch_size, embedding_planes, block_nums, head_nums,
         feedforward_ratio, **kwargs):
    return ViT(patch_size=patch_size, embedding_planes=embedding_planes,
               block_nums=block_nums, head_nums=head_nums,
               feedforward_ratio=feedforward_ratio, **kwargs)


@BACKBONES.register()
def vit_base_patch16(**kwargs):
    return _vit(16, 768, 12, 12, 4, **kwargs)


@BACKBONES.register()
def vit_large_patch16(**kwargs):
    return _vit(16, 1024, 24, 16, 4, **kwargs)


@BACKBONES.register()
def vit_huge_patch14(**kwargs):
    return _vit(14, 1280, 32, 16, 4, **kwargs)


@BACKBONES.register()
def vit_small_patch14(**kwargs):
    return _vit(14, 384, 12, 6, 4, **kwargs)


@BACKBONES.register()
def vit_base_patch14(**kwargs):
    return _vit(14, 768, 12, 12, 4, **kwargs)


@BACKBONES.register()
def vit_large_patch14(**kwargs):
    return _vit(14, 1024, 24, 16, 4, **kwargs)


@BACKBONES.register()
def vit_giant_patch14(**kwargs):
    return _vit(14, 1536, 40, 24, 4, **kwargs)


@BACKBONES.register()
def sapiens_0_3b(**kwargs):
    return _vit(16, 1024, 24, 16, 4, **kwargs)


@BACKBONES.register()
def sapiens_0_6b(**kwargs):
    return _vit(16, 1280, 32, 16, 4, **kwargs)


@BACKBONES.register()
def sapiens_1_0b(**kwargs):
    return _vit(16, 1536, 40, 24, 4, **kwargs)


@BACKBONES.register()
def sapiens_2_0b(**kwargs):
    return _vit(16, 1920, 48, 32, 4, **kwargs)
