"""SAM ViT image encoder (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything/image_encoder.py:
261 — patch embed + learned pos embed, windowed (14x14) attention with
decomposed relative position bias, 4 global-attention layers, conv neck with
channels-last LayerNorm).

TPU-first: all tensors stay NHWC; window partition is static reshape/transpose
(no dynamic padding: SAM's 64x64 grid pads to 70 for 14x14 windows at trace
time). Attention softmax in f32 on bf16 matmuls.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..common import cdtype

__all__ = ["ViTImageEncoder"]


def window_partition(x, window_size: int):
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size,
                  window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                    window_size, c)
    return windows, (hp, wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size,
                        window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Slice [2*max(q,k)-1, C] rel-pos table by relative coordinates."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos,
                                   (max_rel_dist, rel_pos.shape[1]),
                                   method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh,
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw,
                       preferred_element_type=jnp.float32)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


class RelPosAttention(nn.Module):
    head_nums: int
    input_size: Tuple[int, int]
    use_flash_attention: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.head_nums
        qkv = nn.Dense(3 * c, dtype=cdtype(), param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.head_nums, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.head_nums,
                                                   h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim),
                               jnp.float32)
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim),
                               jnp.float32)

        n = h * w
        if self.use_flash_attention and n % 128 == 0:
            # decomposed bias tables, never a persistent [N,N] matrix:
            # blockwise online softmax in plain XLA (the Pallas kernel
            # doesn't lower on the production TPU stack — see
            # ops/flash_attention.py "XLA online-softmax" section)
            from ...ops.flash_attention import flash_attention_relpos_xla
            rh = get_rel_pos(h, h, rel_pos_h)
            rw = get_rel_pos(w, w, rel_pos_w)
            r_q = q.astype(jnp.float32).reshape(-1, h, w, head_dim)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh,
                               preferred_element_type=jnp.float32)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw,
                               preferred_element_type=jnp.float32)
            out = flash_attention_relpos_xla(
                q, k, v, rel_h.reshape(-1, n, h), rel_w.reshape(-1, n, w))
        else:
            attn = jnp.einsum("bnd,bmd->bnm", q * (head_dim**-0.5), k,
                              preferred_element_type=jnp.float32)
            attn = add_decomposed_rel_pos(attn, q.astype(jnp.float32),
                                          rel_pos_h, rel_pos_w, (h, w),
                                          (h, w))
            attn = jax.nn.softmax(attn, axis=-1).astype(cdtype())
            out = jnp.einsum("bnm,bmd->bnd", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, self.head_nums, h, w, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(c, dtype=cdtype(), param_dtype=jnp.float32,
                        name="proj")(out.astype(cdtype()))


class EncoderBlock(nn.Module):
    head_nums: int
    mlp_ratio: float = 4.0
    input_size: Tuple[int, int] = (64, 64)
    window_size: int = 0
    use_flash_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = h.astype(cdtype())
        if self.window_size > 0:
            hh, ww = h.shape[1], h.shape[2]
            h, pad_hw = window_partition(h, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        h = RelPosAttention(self.head_nums, attn_size,
                            self.use_flash_attention, name="attn")(h)
        if self.window_size > 0:
            h = window_unpartition(h, self.window_size, pad_hw, (hh, ww))
        x = shortcut + h.astype(shortcut.dtype)

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(x.shape[-1] * self.mlp_ratio), dtype=cdtype(),
                     param_dtype=jnp.float32, name="mlp_lin1")(
            h.astype(cdtype()))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=cdtype(),
                     param_dtype=jnp.float32, name="mlp_lin2")(h)
        return x + h.astype(x.dtype)


class LayerNormChannelsLast(nn.Module):
    """Reference LayerNorm2d normalises over channels; NHWC makes it a plain
    feature LayerNorm."""

    @nn.compact
    def __call__(self, x):
        u = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        s = jnp.mean((x.astype(jnp.float32) - u)**2, axis=-1, keepdims=True)
        xn = (x.astype(jnp.float32) - u) * jax.lax.rsqrt(s + 1e-6)
        weight = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return xn * weight + bias


class ViTImageEncoder(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    embedding_planes: int = 768
    block_nums: int = 12
    head_nums: int = 12
    mlp_ratio: float = 4.0
    out_planes: int = 256
    window_size: int = 0
    global_attn_indexes: Sequence[int] = ()
    use_gradient_checkpoint: bool = False
    use_flash_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.image_size // self.patch_size
        x = nn.Conv(self.embedding_planes,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=cdtype(),
                    param_dtype=jnp.float32, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.embedding_planes), jnp.float32)
        x = x + pos.astype(x.dtype)

        block_cls = EncoderBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(EncoderBlock, static_argnums=(2,))
        for i in range(self.block_nums):
            ws = (self.window_size if i not in self.global_attn_indexes
                  else 0)
            x = block_cls(self.head_nums, self.mlp_ratio, (g, g), ws,
                          self.use_flash_attention,
                          name=f"blocks_{i}")(x, train)

        x = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                    dtype=cdtype(), param_dtype=jnp.float32,
                    name="neck_conv1")(x)
        x = LayerNormChannelsLast(name="neck_ln1")(x)
        x = nn.Conv(self.out_planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=cdtype(),
                    param_dtype=jnp.float32,
                    name="neck_conv2")(x.astype(cdtype()))
        x = LayerNormChannelsLast(name="neck_ln2")(x)
        return x  # [B, g, g, out_planes]
