"""SAM prompt encoder (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything/prompt_encoder.py:
69 — random-fourier point/box embedding, mask downscaling path, no-mask
embedding).

Fixed-shape: point prompts arrive as [B, N, 3] (x, y, label) with label -1 =
padding/"not a point" — the collater's contract — so the reference's
boolean-indexed embedding adds become jnp.where selects.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PromptEncoder", "PositionEmbeddingRandom"]

from .image_encoder import LayerNormChannelsLast


class PositionEmbeddingRandom(nn.Module):
    num_pos_feats: int = 128

    def setup(self):
        # fixed gaussian projection (reference registers a buffer); stored as
        # a param initialised from a fixed normal draw — training leaves it
        # effectively frozen via near-zero grads, and weight converters can
        # overwrite it.
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0), (2, self.num_pos_feats), jnp.float32)

    def _pe(self, coords):
        coords = 2.0 * coords - 1.0
        coords = coords @ jax.lax.stop_gradient(self.gaussian_matrix)
        coords = 2.0 * math.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid_pe(self, size: int):
        """[H, W, C] dense positional encoding."""
        ys = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        xs = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        grid = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)  # [H,W,2] (x,y)
        return self._pe(grid)

    def coords_pe(self, coords, image_size: int):
        return self._pe(coords.astype(jnp.float32) / image_size)


class PromptEncoder(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    embedding_planes: int = 256
    mask_inter_planes: int = 16

    def setup(self):
        self.image_embedding_size = self.image_size // self.patch_size
        self.pe_layer = PositionEmbeddingRandom(self.embedding_planes // 2)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embedding_planes), jnp.float32)
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (self.embedding_planes,), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (self.embedding_planes,), jnp.float32)

        q = self.mask_inter_planes
        self.mask_conv1 = nn.Conv(q // 4, (2, 2), strides=(2, 2),
                                  padding="VALID", dtype=jnp.float32,
                                  name="mask_conv1")
        self.mask_ln1 = LayerNormChannelsLast(name="mask_ln1")
        self.mask_conv2 = nn.Conv(q, (2, 2), strides=(2, 2), padding="VALID",
                                  dtype=jnp.float32, name="mask_conv2")
        self.mask_ln2 = LayerNormChannelsLast(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embedding_planes, (1, 1),
                                  dtype=jnp.float32, name="mask_conv3")

    def embed_points(self, points, pad: bool):
        """points [B,N,3] (x,y,label; label -1 pad / 0 neg / 1 pos)."""
        coords = points[..., 0:2] + 0.5
        labels = points[..., 2]
        if pad:
            b = points.shape[0]
            coords = jnp.concatenate(
                [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        pe = self.pe_layer.coords_pe(coords, self.image_size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point_embed, 0.0)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1], 0.0)
        return pe

    def embed_boxes(self, boxes):
        """boxes [B,4] or [B,1,4]."""
        boxes = boxes.reshape(boxes.shape[0], -1)[:, :4] + 0.5
        coords = boxes.reshape(-1, 2, 2)
        pe = self.pe_layer.coords_pe(coords, self.image_size)
        pe = pe.at[:, 0].add(self.point_embeddings[2])
        pe = pe.at[:, 1].add(self.point_embeddings[3])
        return pe

    def embed_masks(self, masks):
        """masks [B,H,W,1] at 4x the image-embedding resolution."""
        x = self.mask_conv1(masks)
        x = nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    def __call__(self, points=None, boxes=None, masks=None):
        if points is not None:
            batch = points.shape[0]
        elif boxes is not None:
            batch = boxes.shape[0]
        else:
            batch = masks.shape[0]

        sparse = jnp.zeros((batch, 0, self.embedding_planes), jnp.float32)
        if points is not None:
            sparse = jnp.concatenate(
                [sparse, self.embed_points(points, pad=boxes is None)],
                axis=1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self.embed_boxes(boxes)],
                                     axis=1)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            s = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[None, None, None, :],
                (batch, s, s, self.embedding_planes))
        return sparse, dense

    def get_dense_pe(self):
        return self.pe_layer.grid_pe(self.image_embedding_size)[None]
