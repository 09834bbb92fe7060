"""DCNv2 / modulated deformable convolution (parity: reference
simpleAICV/detection/models/dcnv2.py:8-61, which wraps torchvision's native
deform_conv2d; used by detection heads / SOLOv2 variants).

TPU-native: offsets/masks come from a regular conv; the deformable sampling
reuses the MSDA bilinear-gather core (one 'level'), then a dense matmul with
the kernel — gather + MXU instead of custom CUDA."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .msda import _bilinear_gather_level

__all__ = ["DeformConv2d", "deform_conv2d"]


def deform_conv2d(x, offsets, mask, kernel, stride: int = 1):
    """x [B,H,W,C]; offsets [B,Ho,Wo,K*K*2] (dy,dx per tap);
    mask [B,Ho,Wo,K*K] in [0,1]; kernel [K,K,C,O]. SAME padding."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    ho, wo = offsets.shape[1], offsets.shape[2]

    # base sampling grid: output position * stride + tap offset - pad
    pad = (k - 1) // 2
    ys = jnp.arange(ho, dtype=jnp.float32) * stride
    xs = jnp.arange(wo, dtype=jnp.float32) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # [Ho,Wo]
    ky, kx = jnp.meshgrid(jnp.arange(k, dtype=jnp.float32),
                          jnp.arange(k, dtype=jnp.float32), indexing="ij")
    taps = jnp.stack([kx.reshape(-1), ky.reshape(-1)], -1)  # [K2,2] (x,y)

    off = offsets.reshape(b, ho, wo, k * k, 2)
    # sample locations in pixel coords (x, y)
    loc_x = gx[None, :, :, None] + taps[None, None, None, :, 0] - pad + \
        off[..., 1]
    loc_y = gy[None, :, :, None] + taps[None, None, None, :, 1] - pad + \
        off[..., 0]
    # -> normalized [0,1] with align_corners=False convention of the core
    loc = jnp.stack([(loc_x + 0.5) / w, (loc_y + 0.5) / h], -1)
    loc = loc.reshape(b, ho * wo, 1, k * k, 2)            # [B,Lq,1heads,P,2]

    value = x.reshape(b, h * w, 1, c)                     # [B,S,1,C]
    sampled = _bilinear_gather_level(value.astype(jnp.float32),
                                     loc.astype(jnp.float32), h, w)
    # [B, Lq, 1, K2, C]
    sampled = sampled[:, :, 0] * mask.reshape(b, ho * wo, k * k, 1)
    out = jnp.einsum("bqkc,kco->bqo", sampled,
                     kernel.reshape(k * k, c, -1),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, ho, wo, -1)


class DeformConv2d(nn.Module):
    """Modulated deformable conv layer: offset/mask conv + deformable gather
    (reference dcnv2.py DCNv2 head)."""
    planes: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = (k - 1) // 2
        om = nn.Conv(3 * k * k, (k, k), strides=(self.stride, self.stride),
                     padding=[(pad, pad), (pad, pad)],
                     kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                     name="offset_mask_conv")(x.astype(jnp.float32))
        offsets = om[..., :2 * k * k]
        mask = jax.nn.sigmoid(om[..., 2 * k * k:])
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.planes), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.planes,),
                          jnp.float32)
        return deform_conv2d(x, offsets, mask, kernel, self.stride) + bias
