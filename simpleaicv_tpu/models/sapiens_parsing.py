"""Sapiens parsing heads (parity: reference
simpleAICV/face_parsing/models/sapiens_face_parsing.py:241 and the human
variant — a sapiens ViT backbone (no cls pooling) + deconvolution seg head
upsampling token features to per-pixel class logits)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from .common import cdtype

from ..core.registry import BACKBONES, MODELS
from .backbones.vit import TransformerEncoderLayer
from ..ops.upsample import resize_bilinear

__all__ = ["SapiensParsing"]


class SapiensParsing(nn.Module):
    backbone_type: str = "sapiens_0_3b"
    num_classes: int = 19
    image_size: int = 512
    head_planes: int = 256
    use_gradient_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        # sapiens ViT features without the classification head: patch tokens
        from .backbones.vit import ViT
        backbone = BACKBONES.create(
            self.backbone_type, image_size=self.image_size,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        patch = backbone.patch_size
        c = backbone.embedding_planes
        b = x.shape[0]
        # run the ViT trunk manually to keep spatial tokens
        feat = nn.Conv(c, (patch, patch), strides=(patch, patch),
                       padding="VALID", dtype=cdtype(),
                       param_dtype=jnp.float32, name="patch_embedding")(x)
        gh, gw = feat.shape[1], feat.shape[2]
        feat = feat.reshape(b, gh * gw, c)
        pos = self.param("position_encoding",
                         nn.initializers.truncated_normal(0.02),
                         (1, gh * gw, c), jnp.float32)
        feat = feat + pos.astype(feat.dtype)
        layer_cls = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            layer_cls = nn.remat(layer_cls, static_argnums=(2,))
        for i in range(backbone.block_nums):
            feat = layer_cls(backbone.head_nums, backbone.feedforward_ratio,
                             name=f"blocks_{i}")(feat, train)
        feat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            name="norm")(feat)
        feat = feat.reshape(b, gh, gw, c).astype(jnp.float32)

        # deconv seg head: two 2x upsamples + predict, bilinear to input res
        y = nn.ConvTranspose(self.head_planes, (2, 2), strides=(2, 2),
                             dtype=jnp.float32, name="deconv1")(feat)
        y = nn.relu(nn.GroupNorm(num_groups=32, name="gn1")(y))
        y = nn.ConvTranspose(self.head_planes, (2, 2), strides=(2, 2),
                             dtype=jnp.float32, name="deconv2")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, name="gn2")(y))
        y = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                    name="pred_conv")(y)
        return resize_bilinear(y, (h, w), spatial_axes=(1, 2))


for _name, _bb in [("sapiens_0_3b_face_parsing", "sapiens_0_3b"),
                   ("sapiens_0_6b_face_parsing", "sapiens_0_6b"),
                   ("sapiens_1_0b_face_parsing", "sapiens_1_0b"),
                   ("sapiens_0_3b_human_parsing", "sapiens_0_3b"),
                   ("sapiens_0_6b_human_parsing", "sapiens_0_6b"),
                   ("sapiens_1_0b_human_parsing", "sapiens_1_0b")]:
    MODELS.register(_name)(
        lambda backbone_type=_bb, **kw: SapiensParsing(
            backbone_type=backbone_type, **kw))
