"""SAM mask decoder + TwoWayTransformer (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything/mask_decoder.py:53
and transformer.py:70-178 — iou+mask tokens, 2 two-way blocks, hypernetwork
mask heads, iou prediction MLP). NHWC image embeddings throughout."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .image_encoder import LayerNormChannelsLast

__all__ = ["MaskDecoder", "TwoWayTransformer"]


class Attention(nn.Module):
    head_nums: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        inter = c // self.downsample_rate
        head_dim = inter // self.head_nums

        def proj(x, name):
            return nn.Dense(inter, dtype=jnp.float32, name=name)(x)

        def heads(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.head_nums, head_dim).transpose(
                0, 2, 1, 3)

        qh, kh, vh = heads(proj(q, "q_proj")), heads(proj(k, "k_proj")), \
            heads(proj(v, "v_proj"))
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / (head_dim**0.5), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                         preferred_element_type=jnp.float32)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inter)
        return nn.Dense(c, dtype=jnp.float32, name="out_proj")(out)


class MLPBlock(nn.Module):
    mlp_planes: int = 2048

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(self.mlp_planes, dtype=jnp.float32, name="lin1")(x)
        return nn.Dense(c, dtype=jnp.float32, name="lin2")(nn.relu(h))


class TwoWayAttentionBlock(nn.Module):
    head_nums: int
    mlp_planes: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = Attention(self.head_nums, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(self.head_nums, name="self_attn")(
                q, q, queries)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.head_nums, self.attention_downsample_rate,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_planes, name="mlp")(queries)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.head_nums, self.attention_downsample_rate,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(dtype=jnp.float32, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    block_nums: int = 2
    head_nums: int = 8
    mlp_planes: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe [B,H,W,C] NHWC; point_embedding [B,N,C]."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding

        for i in range(self.block_nums):
            queries, keys = TwoWayAttentionBlock(
                self.head_nums, self.mlp_planes,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.head_nums, self.attention_downsample_rate,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32,
                               name="norm_final_attn")(queries)
        return queries, keys


class MLP(nn.Module):
    hidden_planes: int
    planes: int
    layer_nums: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.layer_nums):
            out = self.planes if i == self.layer_nums - 1 else \
                self.hidden_planes
            x = nn.Dense(out, dtype=jnp.float32, name=f"layers_{i}")(x)
            if i < self.layer_nums - 1:
                x = nn.relu(x)
        return x


class MaskDecoder(nn.Module):
    inplanes: int = 256
    num_multimask_outputs: int = 3
    iou_prediction_head_block_nums: int = 3
    iou_prediction_head_hidden_planes: int = 256

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, mask_out_idxs=(0, 1, 2, 3),
                 return_feats: bool = False):
        """image_embeddings [B,H,W,C]; returns (masks [B,K,4h,4w], iou [B,K]).

        ``return_feats`` additionally returns the upscaled mask feature
        [B,4h,4w,C/8] (the reference MaskDecoderMatting's ``feat1``,
        sam_matting1.py:375-415) for the matting fusion head."""
        n_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.inplanes), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_tokens, self.inplanes), jnp.float32)

        bp = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (bp,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings],
                                 axis=1)

        src = image_embeddings
        if src.shape[0] != bp:
            src = jnp.repeat(src, bp // src.shape[0], axis=0)
        src = src + dense_prompt_embeddings
        b, h, w, c = src.shape

        hs, src = TwoWayTransformer(name="transformer")(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + n_tokens]

        src = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(self.inplanes // 4, (2, 2), strides=(2, 2),
                             dtype=jnp.float32, name="upscale_convt1")(src)
        x = nn.gelu(LayerNormChannelsLast(name="upscale_ln")(x),
                    approximate=False)
        x = nn.ConvTranspose(self.inplanes // 8, (2, 2), strides=(2, 2),
                             dtype=jnp.float32, name="upscale_convt2")(x)
        upscaled = nn.gelu(x, approximate=False)  # [B,4h,4w,C/8]

        hyper = [MLP(self.inplanes, self.inplanes // 8, 3,
                     name=f"output_hypernetworks_mlps_{i}")(
            mask_tokens_out[:, i]) for i in range(n_tokens)]
        hyper = jnp.stack(hyper, axis=1)  # [B, n_tokens, C/8]

        uh, uw = upscaled.shape[1], upscaled.shape[2]
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, upscaled,
                           preferred_element_type=jnp.float32)
        iou_pred = MLP(self.iou_prediction_head_hidden_planes, n_tokens,
                       self.iou_prediction_head_block_nums,
                       name="iou_prediction_head")(iou_token_out)

        idxs = jnp.asarray(mask_out_idxs)
        if return_feats:
            return masks[:, idxs], iou_pred[:, idxs], upscaled
        return masks[:, idxs], iou_pred[:, idxs]
