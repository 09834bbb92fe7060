"""Diffusion UNet (parity: reference
simpleAICV/diffusion_model/models/diffusion_unet.py:17-460 — DDPM UNet with
sinusoidal time embedding, GroupNorm+SiLU ResBlocks with time (and optional
class) projection, single-head self-attention blocks, conv up/downsampling,
optional class conditioning with padding idx 0).

NHWC; attention runs as f32 einsum over hw tokens.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS
from ..ops.upsample import upsample_nearest_2x

__all__ = ["DiffusionUNet"]


def time_embedding(t, planes: int):
    half = planes // 2
    freq = jnp.exp(-jnp.arange(half, dtype=jnp.float32) * math.log(10000.0)
                   / (half - 1))
    emb = t.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if planes % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn(num_groups, name):
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _conv(planes, k=3, stride=1, name=None):
    pad = (k - 1) // 2
    return nn.Conv(planes, (k, k), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=True,
                   dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class AttentionBlock(nn.Module):
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hnorm = _gn(self.num_groups, "norm")(x)
        q = _conv(c, 1, name="q")(hnorm).reshape(b, h * w, c)
        k = _conv(c, 1, name="k")(hnorm).reshape(b, h * w, c)
        v = _conv(c, 1, name="v")(hnorm).reshape(b, h * w, c)
        attn = jnp.einsum("bnc,bmc->bnm", q, k,
                          preferred_element_type=jnp.float32) * (c**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v,
                         preferred_element_type=jnp.float32)
        out = _conv(c, 1, name="proj_out")(out.reshape(b, h, w, c))
        return x + out


class ResBlock(nn.Module):
    planes: int
    num_groups: int = 32
    has_class: bool = False
    dropout_prob: float = 0.0
    use_attention: bool = False

    @nn.compact
    def __call__(self, x, emb_time, emb_class, train: bool = False):
        inplanes = x.shape[-1]
        h = _gn(self.num_groups, "norm1")(x)
        h = _conv(self.planes, name="conv1")(nn.silu(h))
        h = h + nn.Dense(self.planes, name="time_proj")(
            nn.silu(emb_time))[:, None, None, :]
        if self.has_class and emb_class is not None:
            h = h + nn.Dense(self.planes, name="class_proj")(
                nn.silu(emb_class))[:, None, None, :]
        h = _gn(self.num_groups, "norm2")(h)
        h = nn.silu(h)
        if self.dropout_prob > 0.0:
            h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        h = _conv(self.planes, name="conv2")(h)
        if inplanes != self.planes:
            x = _conv(self.planes, 1, name="nin_shortcut")(x)
        x = x + h
        if self.use_attention:
            x = AttentionBlock(self.num_groups, name="attention")(x)
        return x


class DiffusionUNet(nn.Module):
    inplanes: int = 3
    planes: int = 128
    planes_multi: Sequence[int] = (1, 2, 2, 2)
    time_embedding_ratio: int = 4
    block_nums: int = 2
    dropout_prob: float = 0.0
    num_groups: int = 32
    use_attention_planes_multi_idx: Sequence[int] = (0, 1, 2, 3)
    num_classes: Optional[int] = None
    use_gradient_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, t, class_label=None, train: bool = False):
        planes = self.planes
        time_planes = planes * self.time_embedding_ratio

        emb = time_embedding(t, planes)
        emb = nn.Dense(time_planes, name="time_mlp_1")(emb)
        emb = nn.Dense(time_planes, name="time_mlp_2")(nn.silu(emb))

        emb_class = None
        if self.num_classes and class_label is not None:
            ce = nn.Embed(self.num_classes + 1, planes,
                          name="class_embed")(class_label.astype(jnp.int32))
            # padding_idx 0 = unconditional token
            ce = jnp.where((class_label == 0)[:, None], 0.0, ce)
            ce = nn.Dense(time_planes, name="class_mlp_1")(ce)
            emb_class = nn.Dense(time_planes, name="class_mlp_2")(nn.silu(ce))

        res_kwargs = dict(num_groups=self.num_groups,
                          has_class=bool(self.num_classes),
                          dropout_prob=self.dropout_prob)
        block_cls = ResBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(ResBlock, static_argnums=(4,))

        x = _conv(planes, name="stem")(x)
        skips = [x]
        cur = planes
        n_levels = len(self.planes_multi)
        bidx = 0
        for idx, mult in enumerate(self.planes_multi):
            per = int(planes * mult)
            for _ in range(self.block_nums):
                x = block_cls(per, use_attention=(
                    idx in self.use_attention_planes_multi_idx),
                    name=f"down_{bidx}", **res_kwargs)(x, emb, emb_class,
                                                       train)
                bidx += 1
                skips.append(x)
            cur = per
            if idx != n_levels - 1:
                # reference pads (0,1,0,1) then 3x3/2 conv with no padding
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(cur, (3, 3), strides=(2, 2), padding="VALID",
                            use_bias=True, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            name=f"down_{bidx}_conv")(x)
                bidx += 1
                skips.append(x)

        x = block_cls(cur, use_attention=True, name="middle_0",
                      **res_kwargs)(x, emb, emb_class, train)
        x = block_cls(cur, use_attention=False, name="middle_1",
                      **res_kwargs)(x, emb, emb_class, train)

        up_attn_idx = [n_levels - 1 - i
                       for i in self.use_attention_planes_multi_idx]
        bidx = 0
        for idx in reversed(range(n_levels)):
            per = int(planes * self.planes_multi[idx])
            for _ in range(self.block_nums + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = block_cls(per, use_attention=(idx in up_attn_idx),
                              name=f"up_{bidx}", **res_kwargs)(x, emb,
                                                               emb_class,
                                                               train)
                bidx += 1
            cur = per
            if idx != 0:
                b, h, w, c = x.shape
                x = upsample_nearest_2x(x, spatial_axes=(1, 2))
                x = _conv(cur, 3, name=f"up_{bidx}_conv")(x)
                bidx += 1

        assert not skips
        x = _gn(self.num_groups, "last_norm")(x)
        x = _conv(self.inplanes, name="last_conv")(nn.silu(x))
        return x


MODELS.register("DiffusionUNet")(lambda **kw: DiffusionUNet(**kw))
