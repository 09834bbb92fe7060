"""DETR (parity: reference simpleAICV/detection/models/detr.py:44-400 —
post-norm 6+6 transformer over C5 features with sine positional embedding and
key-padding masks, 100 learned queries, per-decoder-layer cls/reg heads with
sigmoid cxcywh boxes)."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.registry import BACKBONES, MODELS

__all__ = ["DETR", "resnet18_detr", "resnet34_detr", "resnet50_detr",
           "resnet101_detr", "resnet152_detr"]


def sine_position_embedding(mask, planes: int, temperature=10000.0,
                            eps=1e-6):
    """mask [B,H,W] True=padding -> [B,H,W,2*planes] sine embedding
    (reference PositionEmbeddingBlock)."""
    not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(planes, dtype=jnp.float32)
    dim_t = temperature**(2 * (dim_t // 2) / planes)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class MHA(nn.Module):
    head_nums: int = 8
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, train=False):
        """q [B,Nq,C]; k/v [B,Nk,C]; key_padding_mask [B,Nk] True=pad."""
        c = q.shape[-1]
        hd = c // self.head_nums

        def proj(x, name):
            return nn.Dense(c, dtype=jnp.float32, name=name)(x)

        qh = proj(q, "q").reshape(*q.shape[:2], self.head_nums, hd)
        kh = proj(k, "k").reshape(*k.shape[:2], self.head_nums, hd)
        vh = proj(v, "v").reshape(*v.shape[:2], self.head_nums, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * (hd**-0.5)
        if key_padding_mask is not None:
            # The reference passes masks.float() into nn.MultiheadAttention
            # (detr.py:246-252 via transformer forward), and torch treats a
            # FLOAT key_padding_mask as ADDITIVE: padded logits get +1.0, not
            # -inf. Reproduced exactly so converted reference checkpoints
            # behave identically (verified against torch 2.13).
            attn = attn + key_padding_mask.astype(attn.dtype)[:, None, None, :]
        attn = jax.nn.softmax(attn, axis=-1)
        if self.dropout_prob > 0:
            attn = nn.Dropout(self.dropout_prob, deterministic=not train)(
                attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh)
        out = out.reshape(*q.shape[:2], c)
        return nn.Dense(c, dtype=jnp.float32, name="out")(out)


class EncoderLayer(nn.Module):
    head_nums: int = 8
    feedforward_ratio: int = 4
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, src, pos, key_padding_mask, train=False):
        q = k = src + pos
        h = MHA(self.head_nums, self.dropout_prob, name="attention")(
            q, k, src, key_padding_mask, train)
        src = nn.LayerNorm(name="norm1")(src + h)
        c = src.shape[-1]
        h = nn.Dense(c * self.feedforward_ratio, name="linear1")(src)
        h = nn.Dense(c, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm2")(src + h)


class DecoderLayer(nn.Module):
    head_nums: int = 8
    feedforward_ratio: int = 4
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, key_padding_mask,
                 train=False):
        q = k = tgt + query_pos
        h = MHA(self.head_nums, self.dropout_prob, name="attention")(
            q, k, tgt, None, train)
        tgt = nn.LayerNorm(name="norm1")(tgt + h)
        h = MHA(self.head_nums, self.dropout_prob,
                name="multihead_attention")(
            tgt + query_pos, memory + pos, memory, key_padding_mask, train)
        tgt = nn.LayerNorm(name="norm2")(tgt + h)
        c = tgt.shape[-1]
        h = nn.Dense(c * self.feedforward_ratio, name="linear1")(tgt)
        h = nn.Dense(c, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm3")(tgt + h)


class DETR(nn.Module):
    backbone_type: str
    hidden_inplanes: int = 256
    query_nums: int = 100
    num_classes: int = 80
    encoder_layer_nums: int = 6
    decoder_layer_nums: int = 6
    head_nums: int = 8
    dropout_prob: float = 0.1
    use_gradient_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, masks=None, train: bool = False):
        """x [B,H,W,3]; masks [B,H,W] True/1 = padding (None or a plain
        bool — e.g. the generic eval CLIs' ``apply(v, x, False)`` — means
        no padding anywhere). Returns
        (cls_outputs [L,B,Q,num_classes+1], reg_outputs [L,B,Q,4])."""
        if masks is None or isinstance(masks, bool):
            masks = jnp.zeros(x.shape[:3], jnp.float32)
        backbone = BACKBONES.create(
            self.backbone_type, features_only=True, name="backbone",
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        feat = backbone(x, train)[-1]           # C5 [B,h,w,C]
        b, h, w, _ = feat.shape
        # torch F.interpolate nearest convention: src = floor(dst * in/out)
        # (reference detr.py:324-326); jax.image.resize uses half-pixel
        # centers, which picks different rows at the pad boundary
        hidx = (jnp.arange(h) * masks.shape[1]) // h
        widx = (jnp.arange(w) * masks.shape[2]) // w
        m = masks[:, hidx][:, :, widx] > 0.5
        pos = sine_position_embedding(m, self.hidden_inplanes // 2)

        src = nn.Conv(self.hidden_inplanes, (1, 1), dtype=jnp.float32,
                      name="proj_conv")(feat.astype(jnp.float32))
        src = src.reshape(b, h * w, self.hidden_inplanes)
        pos = pos.reshape(b, h * w, self.hidden_inplanes)
        pad = m.reshape(b, h * w)

        for i in range(self.encoder_layer_nums):
            src = EncoderLayer(self.head_nums, 4, self.dropout_prob,
                               name=f"encoder_{i}")(src, pos, pad, train)

        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0),
                                 (self.query_nums, self.hidden_inplanes),
                                 jnp.float32)
        query_pos = jnp.broadcast_to(query_embed[None],
                                     (b,) + query_embed.shape)
        tgt = jnp.zeros_like(query_pos)

        # reference applies decoder_norm to EVERY intermediate output
        # (detr.py:258-260), not only the final one
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        inter = []
        for i in range(self.decoder_layer_nums):
            tgt = DecoderLayer(self.head_nums, 4, self.dropout_prob,
                               name=f"decoder_{i}")(tgt, src, query_pos, pos,
                                                    pad, train)
            inter.append(decoder_norm(tgt))
        hs = jnp.stack(inter, axis=0)           # [L,B,Q,C]

        cls_out = nn.Dense(self.num_classes + 1, name="cls_head")(hs)
        reg = hs
        for i in range(2):
            reg = nn.relu(nn.Dense(self.hidden_inplanes,
                                   name=f"reg_head_{i}")(reg))
        reg_out = nn.sigmoid(nn.Dense(4, name="reg_head_out")(reg))
        return [cls_out, reg_out]


def _detr(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return DETR(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_detr(**kwargs):
    return _detr("resnet18", **kwargs)


@MODELS.register()
def resnet34_detr(**kwargs):
    return _detr("resnet34", **kwargs)


@MODELS.register()
def resnet50_detr(**kwargs):
    return _detr("resnet50", **kwargs)


@MODELS.register()
def resnet101_detr(**kwargs):
    return _detr("resnet101", **kwargs)


@MODELS.register()
def resnet152_detr(**kwargs):
    return _detr("resnet152", **kwargs)
