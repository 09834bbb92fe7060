"""Sapiens parsing models (parity: reference
simpleAICV/face_parsing/models/sapiens_face_parsing.py and the human
variant simpleAICV/human_parsing/models/sapiens_human_parsing.py).

Structure matches the reference exactly (cross-framework parity test:
tests/test_reference_parity.py::test_sapiens_parsing_parity):

  * backbone: the reference ViTBackbone (detection/models/backbones/
    vit.py:70-147) — patch conv (with bias), learned pos-embed (no cls
    token), TransformerEncoderLayer stack, NO final norm, reshape to
    spatial feature map.
  * head: VitHead (sapiens_face_parsing.py:25-95) — 4x [ConvTranspose
    k4 s2 p1 (no bias) + InstanceNorm (affine-free) + SiLU] with planes
    (512,256,128,64), then 4x [Conv k1 (no bias) + InstanceNorm + SiLU]
    with planes (64,64,32,32), then a 1x1 pred conv with bias.  The four
    stride-2 deconvs upsample the stride-16 tokens back to input
    resolution — no bilinear resize.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import cdtype
from ..core.registry import BACKBONES, MODELS
from .backbones.vit import TransformerEncoderLayer

__all__ = ["SapiensParsing"]


def _instance_norm(x):
    """torch nn.InstanceNorm2d(planes) default: affine=False, eps=1e-5."""
    return nn.InstanceNorm(epsilon=1e-5, use_bias=False, use_scale=False)(x)


class SapiensParsing(nn.Module):
    backbone_type: str = "sapiens_0_3b"
    num_classes: int = 19
    image_size: int = 512
    deconv_planes: tuple = (512, 256, 128, 64)
    conv_planes: tuple = (64, 64, 32, 32)
    dropout_prob: float = 0.0
    use_gradient_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = BACKBONES.create(
            self.backbone_type, image_size=self.image_size,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        patch = backbone.patch_size
        c = backbone.embedding_planes
        b = x.shape[0]

        # --- reference ViTBackbone: patch conv + pos embed + blocks ---
        feat = nn.Conv(c, (patch, patch), strides=(patch, patch),
                       padding="VALID", dtype=cdtype(),
                       param_dtype=jnp.float32, name="patch_embedding")(x)
        gh, gw = feat.shape[1], feat.shape[2]
        feat = feat.reshape(b, gh * gw, c)
        pos = self.param("position_encoding",
                         nn.initializers.truncated_normal(0.02),
                         (1, gh * gw, c), jnp.float32)
        feat = feat + pos.astype(feat.dtype)
        if train and self.dropout_prob > 0:
            feat = nn.Dropout(self.dropout_prob, deterministic=False)(feat)
        layer_cls = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            layer_cls = nn.remat(layer_cls, static_argnums=(2,))
        for i in range(backbone.block_nums):
            feat = layer_cls(backbone.head_nums, backbone.feedforward_ratio,
                             name=f"blocks_{i}")(feat, train)
        y = feat.reshape(b, gh, gw, c).astype(jnp.float32)

        # --- reference VitHead ---
        # torch ConvTranspose2d(k=4, s=2, p=1, output_padding=0) == flax
        # ConvTranspose(kernel (4,4), strides (2,2), padding ((2,2),(2,2)))
        # — flax pads the stride-dilated input, so torch's crop-p maps to
        # flax pad k-2p-... = 2 per side here; verified numerically to
        # 6e-8 with the converter's flipped IOHW->HWIO kernel
        # (core/converters.py _to_jax_layout, "convt" path trigger)
        for i, planes in enumerate(self.deconv_planes):
            y = nn.ConvTranspose(planes, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)), use_bias=False,
                                 dtype=jnp.float32,
                                 name=f"convt{i + 1}")(y)
            y = nn.silu(_instance_norm(y))
        for i, planes in enumerate(self.conv_planes):
            y = nn.Conv(planes, (1, 1), use_bias=False, dtype=jnp.float32,
                        name=f"conv{i + 1}")(y)
            y = nn.silu(_instance_norm(y))
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="pred_conv")(y)


for _name, _bb in [("sapiens_0_3b_face_parsing", "sapiens_0_3b"),
                   ("sapiens_0_6b_face_parsing", "sapiens_0_6b"),
                   ("sapiens_1_0b_face_parsing", "sapiens_1_0b"),
                   ("sapiens_0_3b_human_parsing", "sapiens_0_3b"),
                   ("sapiens_0_6b_human_parsing", "sapiens_0_6b"),
                   ("sapiens_1_0b_human_parsing", "sapiens_1_0b")]:
    MODELS.register(_name)(
        lambda backbone_type=_bb, **kw: SapiensParsing(
            backbone_type=backbone_type, **kw))
