"""SAM-matting (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything_matting/
sam_matting1.py:309 / sam_matting2.py:307 and the light_segment_anything_
matting variants — SAM whose decoder output feeds matting heads producing
(global trimap 3ch, local alpha 1ch, fused alpha), mirroring PFANMatting's
collaborative fusion).

sam_matting1: heads consume the upscaled decoder embedding;
sam_matting2: heads additionally see the (sigmoided) mask logits.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.registry import MODELS
from ..pfan import PFANMatting
from .image_encoder import LayerNormChannelsLast
from .sam import SAM
from .light_sam import LightSAM

__all__ = ["SAMMatting", "sam_b_matting1", "sam_l_matting1",
           "convformer_m36_sam_matting1"]


class MattingHeads(nn.Module):
    """Trimap (3ch) + alpha (1ch) heads over the upscaled SAM mask feature."""

    @nn.compact
    def __call__(self, feat, mask_logit):
        x = jnp.concatenate([feat, mask_logit], axis=-1)
        x = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=jnp.float32, name="conv1")(x)
        x = nn.gelu(LayerNormChannelsLast(name="ln1")(x), approximate=False)
        g = nn.sigmoid(nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)],
                               dtype=jnp.float32, name="global_pred")(x))
        l = nn.sigmoid(nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                               dtype=jnp.float32, name="local_pred")(x))
        return g, l


class SAMMatting(nn.Module):
    """SAM (or LightSAM) backbone + matting heads on the best mask output."""
    sam: nn.Module

    @nn.compact
    def __call__(self, batch_images, batch_prompts, train: bool = False):
        masks, ious = self.sam(batch_images, batch_prompts,
                               mask_out_idxs=(0,), train=train)
        mask_logit = masks[:, 0][..., None]                # [B,H,W,1]
        feat = jax.image.resize(
            batch_images, mask_logit.shape[:3] + (batch_images.shape[-1],),
            "bilinear")
        g, l = MattingHeads(name="matting_heads")(feat, mask_logit)
        fused = PFANMatting.collaborative_matting(g, l)
        return g, l, fused, ious


@MODELS.register()
def sam_b_matting1(**kwargs):
    return SAMMatting(sam=SAM(image_encoder_embedding_planes=768,
                              image_encoder_block_nums=12,
                              image_encoder_head_nums=12,
                              image_encoder_global_attn_indexes=(2, 5, 8, 11),
                              **kwargs))


@MODELS.register()
def sam_l_matting1(**kwargs):
    return SAMMatting(sam=SAM(image_encoder_embedding_planes=1024,
                              image_encoder_block_nums=24,
                              image_encoder_head_nums=16,
                              image_encoder_global_attn_indexes=(5, 11, 17,
                                                                 23),
                              **kwargs))


@MODELS.register()
def convformer_m36_sam_matting1(**kwargs):
    return SAMMatting(sam=LightSAM(backbone_type="convformer_m36", **kwargs))
