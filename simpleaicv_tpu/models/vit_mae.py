"""MAE pretraining model (parity: reference
simpleAICV/masked_image_modeling/models/vit_mae.py:25-516 — ViT encoder with
75% random masking + fixed 2D sin-cos pos-embed, lightweight decoder with mask
tokens, per-patch MSE/L1 on masked patches).

TPU-first: masking is a batched argsort-of-uniform-noise + take_along_axis
(fully on-device, no data-dependent shapes: keep-length is static), and the
pos-embed is a compile-time constant folded into the graph.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from .common import cdtype
import numpy as np

from ..core.registry import MODELS
from .backbones.vit import TransformerEncoderLayer

__all__ = ["VITMAEPretrainModel",
           "vit_base_patch16_224_mae_pretrain_model",
           "vit_large_patch16_224_mae_pretrain_model",
           "vit_huge_patch14_224_mae_pretrain_model"]


def sincos_2d_pos_embed(embed_dim: int, grid_size: int,
                        cls_token: bool = True) -> np.ndarray:
    """Fixed 2D sin-cos position encoding [1, (1+)N, C]."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # [2, gs, gs]

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim), np.float32), emb],
                             axis=0)
    return emb[None].astype(np.float32)


class VITMAEPretrainModel(nn.Module):
    patch_size: int = 16
    image_size: int = 224
    mask_ratio: float = 0.75
    encoder_embedding_planes: int = 768
    encoder_block_nums: int = 12
    encoder_head_nums: int = 12
    encoder_feedforward_ratio: int = 4
    encoder_dropout_prob: float = 0.0
    decoder_embedding_planes: int = 512
    decoder_block_nums: int = 8
    decoder_head_nums: int = 16
    decoder_feedforward_ratio: int = 4
    decoder_dropout_prob: float = 0.0
    use_gradient_checkpoint: bool = False

    def _layer_cls(self):
        if self.use_gradient_checkpoint:
            return nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        return TransformerEncoderLayer

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: [B, H, W, 3] -> (pred_patches [B, L, p*p*3], mask [B, L])."""
        b = images.shape[0]
        p = self.patch_size
        gs = self.image_size // p
        n_patches = gs * gs
        keep = int(n_patches * (1.0 - self.mask_ratio))
        ce = self.encoder_embedding_planes
        cd = self.decoder_embedding_planes

        # ---- encoder ----
        x = nn.Conv(ce, (p, p), strides=(p, p), padding="VALID",
                    dtype=cdtype(), param_dtype=jnp.float32,
                    name="patch_embedding")(images)
        x = x.reshape(b, n_patches, ce)

        enc_pos = jnp.asarray(sincos_2d_pos_embed(ce, gs, cls_token=True))
        x = x + enc_pos[:, 1:].astype(x.dtype)

        # random masking: shuffle by uniform noise, keep first `keep`
        noise = jax.random.uniform(self.make_rng("mask") if train else
                                   jax.random.PRNGKey(0), (b, n_patches))
        shuffle_ids = jnp.argsort(noise, axis=1)
        restore_ids = jnp.argsort(shuffle_ids, axis=1)
        keep_ids = shuffle_ids[:, :keep]
        x = jnp.take_along_axis(x, keep_ids[:, :, None], axis=1)
        mask = jnp.ones((b, n_patches), jnp.float32).at[:, :keep].set(0.0)
        mask = jnp.take_along_axis(mask, restore_ids, axis=1)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, ce), jnp.float32)
        cls = jnp.broadcast_to(cls_token, (b, 1, ce)).astype(x.dtype)
        cls = cls + enc_pos[:, :1].astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        layer_cls = self._layer_cls()
        for i in range(self.encoder_block_nums):
            x = layer_cls(self.encoder_head_nums,
                          self.encoder_feedforward_ratio,
                          self.encoder_dropout_prob, 0.0,
                          name=f"encoder_blocks_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="encoder_norm")(x)

        # ---- encoder -> decoder ----
        x = nn.Dense(cd, dtype=cdtype(), param_dtype=jnp.float32,
                     name="encoder_to_decoder")(x.astype(cdtype()))

        # ---- decoder: re-insert mask tokens, unshuffle ----
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, cd), jnp.float32)
        masked = jnp.broadcast_to(mask_token,
                                  (b, n_patches - keep, cd)).astype(x.dtype)
        x_patches = jnp.concatenate([x[:, 1:], masked], axis=1)
        x_patches = jnp.take_along_axis(x_patches, restore_ids[:, :, None],
                                        axis=1)
        x = jnp.concatenate([x[:, :1], x_patches], axis=1)

        dec_pos = jnp.asarray(sincos_2d_pos_embed(cd, gs, cls_token=True))
        x = x + dec_pos.astype(x.dtype)

        for i in range(self.decoder_block_nums):
            x = layer_cls(self.decoder_head_nums,
                          self.decoder_feedforward_ratio,
                          self.decoder_dropout_prob, 0.0,
                          name=f"decoder_blocks_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="decoder_norm")(x)
        pred = nn.Dense(p * p * 3, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="decoder_pred")(x.astype(jnp.float32))
        return pred[:, 1:], mask

    def images_to_patch(self, images):
        """[B, H, W, 3] -> [B, L, p*p*3] (NHWC version of reference :433)."""
        b, h, w, c = images.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = images.reshape(b, gh, p, gw, p, c)
        x = jnp.einsum("bhpwqc->bhwpqc", x)
        return x.reshape(b, gh * gw, p * p * c)

    def patch_to_images(self, x):
        b, l, d = x.shape
        p = self.patch_size
        g = int(round(l**0.5))
        imgs = x.reshape(b, g, g, p, p, 3)
        imgs = jnp.einsum("bhwpqc->bhpwqc", imgs)
        return imgs.reshape(b, g * p, g * p, 3)


@MODELS.register()
def vit_base_patch16_224_mae_pretrain_model(**kwargs):
    return VITMAEPretrainModel(patch_size=16, encoder_embedding_planes=768,
                               encoder_block_nums=12, encoder_head_nums=12,
                               **kwargs)


@MODELS.register()
def vit_large_patch16_224_mae_pretrain_model(**kwargs):
    return VITMAEPretrainModel(patch_size=16, encoder_embedding_planes=1024,
                               encoder_block_nums=24, encoder_head_nums=16,
                               **kwargs)


@MODELS.register()
def vit_huge_patch14_224_mae_pretrain_model(**kwargs):
    return VITMAEPretrainModel(patch_size=14, encoder_embedding_planes=1280,
                               encoder_block_nums=32, encoder_head_nums=16,
                               **kwargs)
