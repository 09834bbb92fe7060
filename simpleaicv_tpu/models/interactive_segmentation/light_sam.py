"""LightSAM + SAM distillation wrappers (parity: reference
simpleAICV/interactive_segmentation/models/light_segment_anything/
light_sam.py:30 — convformer image encoder + SAMFPN neck in place of the ViT
encoder — and distill_model.py:25-193 — frozen-teacher encoder/full-SAM
distill pairs)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..common import cdtype

from ...core.registry import BACKBONES, MODELS
from ..detection.fpn import _upsample_to
from ...ops.upsample import resize_bilinear
from .image_encoder import LayerNormChannelsLast
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder
from .sam import SAM

__all__ = ["LightSAM", "SAMFPN", "SAMDistillEncoderModel",
           "SAMDistillModel"]


class SAMFPN(nn.Module):
    """Fuse C2-C5 to a single stride-16 SAM-compatible embedding (reference
    light_segment_anything/fpn.py:6)."""
    out_planes: int = 256

    @nn.compact
    def __call__(self, features, train: bool = False):
        # target: stride 16 == C4 resolution
        c2, c3, c4, c5 = features
        h, w = c4.shape[1], c4.shape[2]
        outs = []
        for i, c in enumerate([c2, c3, c4, c5]):
            x = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                        dtype=cdtype(), param_dtype=jnp.float32,
                        name=f"lateral_{i}")(c)
            x = _upsample_to(x, h, w)
            outs.append(x)
        x = sum(outs)
        x = nn.Conv(self.out_planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=cdtype(),
                    param_dtype=jnp.float32, name="fuse_conv")(x)
        return LayerNormChannelsLast(name="fuse_ln")(x)


class LightSAM(nn.Module):
    backbone_type: str = "convformer_m36"
    image_size: int = 1024
    prompt_encoder_embedding_planes: int = 256
    mask_decoder_num_multimask_outputs: int = 3
    frozen_image_encoder: bool = False
    frozen_prompt_encoder: bool = False
    frozen_mask_decoder: bool = False
    sigmoid_out: bool = False
    binary_mask_out: bool = False
    mask_threshold: float = 0.0
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = SAMFPN(out_planes=self.prompt_encoder_embedding_planes)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size,
            embedding_planes=self.prompt_encoder_embedding_planes)
        self.mask_decoder = MaskDecoder(
            inplanes=self.prompt_encoder_embedding_planes,
            num_multimask_outputs=self.mask_decoder_num_multimask_outputs)

    def encode_image(self, images, train: bool = False):
        feats = self.backbone(images, train)
        emb = self.fpn(feats, train)
        if self.frozen_image_encoder:
            emb = jax.lax.stop_gradient(emb)
        return emb

    def __call__(self, batch_images, batch_prompts,
                 mask_out_idxs=(0, 1, 2, 3), train: bool = False):
        image_embeddings = self.encode_image(batch_images, train)
        sparse, dense = self.prompt_encoder(
            points=batch_prompts.get("prompt_point"),
            boxes=batch_prompts.get("prompt_box"),
            masks=batch_prompts.get("prompt_mask"))
        if self.frozen_prompt_encoder:
            sparse = jax.lax.stop_gradient(sparse)
            dense = jax.lax.stop_gradient(dense)
        masks, ious = self.mask_decoder(
            image_embeddings, self.prompt_encoder.get_dense_pe(), sparse,
            dense, mask_out_idxs=mask_out_idxs)
        b, k, h, w = masks.shape
        masks = resize_bilinear(masks, (self.image_size,
                                        self.image_size),
                                spatial_axes=(2, 3))
        if self.sigmoid_out:
            masks = jax.nn.sigmoid(masks)
        if self.binary_mask_out:
            masks = (masks > self.mask_threshold).astype(jnp.float32)
        return masks, ious

    # same decoder-resolution matting forward as SAM.forward_matting
    forward_matting = SAM.forward_matting


class SAMDistillEncoderModel(nn.Module):
    """Teacher SAM encoder (frozen) + student LightSAM encoder; forward
    returns (teacher_embedding, student_embedding) for the encoder-MSE
    distill loss (reference distill_model.py:25-110)."""
    teacher: nn.Module
    student: nn.Module

    def __call__(self, images, train: bool = False):
        tea = jax.lax.stop_gradient(self.teacher.encode_image(images, False))
        stu = self.student.encode_image(images, train)
        return tea, stu


class SAMDistillModel(nn.Module):
    """Full-SAM distillation: frozen teacher SAM + trainable student
    (SAM or LightSAM); both run the same image+prompts and return
    ((tea_masks, tea_ious), (stu_masks, stu_ious)) for SAMDistillLoss
    (reference distill_model.py:133-252)."""
    teacher: nn.Module
    student: nn.Module

    def __call__(self, batch_images, batch_prompts,
                 mask_out_idxs=(0, 1, 2, 3), train: bool = False):
        tea_masks, tea_ious = self.teacher(batch_images, batch_prompts,
                                           mask_out_idxs, False)
        tea_masks = jax.lax.stop_gradient(tea_masks)
        tea_ious = jax.lax.stop_gradient(tea_ious)
        stu_masks, stu_ious = self.student(batch_images, batch_prompts,
                                           mask_out_idxs, train)
        return (tea_masks, tea_ious), (stu_masks, stu_ious)


def _register_light_sam_variants():
    """The reference registers 8 LightSAM backbone variants
    (light_segment_anything/light_sam.py:18-27); mirror them all, keeping
    the repo's historical ``convformer_m36_light_sam``/``van_b3_light_sam``
    aliases."""
    variants = {
        "vanb0_light_sam": "van_b0", "vanb1_light_sam": "van_b1",
        "vanb2_light_sam": "van_b2", "vanb3_light_sam": "van_b3",
        "convformers18_light_sam": "convformer_s18",
        "convformers36_light_sam": "convformer_s36",
        "convformerm36_light_sam": "convformer_m36",
        "convformerb36_light_sam": "convformer_b36",
        "convformer_m36_light_sam": "convformer_m36",
        "van_b3_light_sam": "van_b3",
    }
    for name, bb in variants.items():
        MODELS.register(name)(
            lambda backbone_type=bb, **kw: LightSAM(
                backbone_type=backbone_type, **kw))


_register_light_sam_variants()
