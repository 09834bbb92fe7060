"""SAM assembly + sam_b/l/h factories (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything/sam.py:25-257).

Freezing: ``frozen_image_encoder`` / ``frozen_prompt_encoder`` cut gradients
with stop_gradient on the submodule outputs — the functional equivalent of the
reference's requires_grad=False loops (sam.py:82-90). Freezing the mask
decoder is handled at the optimizer level (sub_layer_lr=0), since gradients
must still flow *through* it to upstream modules.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.registry import MODELS
from ...ops.upsample import resize_bilinear
from .image_encoder import ViTImageEncoder
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder

__all__ = ["SAM", "sam_b", "sam_l", "sam_h"]


class SAM(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    image_encoder_embedding_planes: int = 768
    image_encoder_block_nums: int = 12
    image_encoder_head_nums: int = 12
    image_encoder_mlp_ratio: float = 4.0
    image_encoder_window_size: int = 14
    image_encoder_global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    prompt_encoder_embedding_planes: int = 256
    prompt_encoder_mask_inter_planes: int = 16
    mask_decoder_num_multimask_outputs: int = 3
    use_gradient_checkpoint: bool = False
    # default ON: XLA online-softmax attention trains SAM-B 1024^2 at
    # 127ms/step vs 199ms for the materialized-einsum path on TPU v5e
    # (bench_all sam_b_1024_train_step{,_flash}, round 3)
    use_flash_attention: bool = True
    frozen_image_encoder: bool = False
    frozen_prompt_encoder: bool = False
    frozen_mask_decoder: bool = False
    sigmoid_out: bool = False
    binary_mask_out: bool = False
    mask_threshold: float = 0.0

    def setup(self):
        self.image_encoder = ViTImageEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            embedding_planes=self.image_encoder_embedding_planes,
            block_nums=self.image_encoder_block_nums,
            head_nums=self.image_encoder_head_nums,
            mlp_ratio=self.image_encoder_mlp_ratio,
            out_planes=self.prompt_encoder_embedding_planes,
            window_size=self.image_encoder_window_size,
            global_attn_indexes=self.image_encoder_global_attn_indexes,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            use_flash_attention=self.use_flash_attention)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            embedding_planes=self.prompt_encoder_embedding_planes,
            mask_inter_planes=self.prompt_encoder_mask_inter_planes)
        self.mask_decoder = MaskDecoder(
            inplanes=self.prompt_encoder_embedding_planes,
            num_multimask_outputs=self.mask_decoder_num_multimask_outputs)

    def encode_image(self, images, train: bool = False):
        emb = self.image_encoder(images, train)
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

        masks, iou_preds = self.mask_decoder(
            image_embeddings, self.prompt_encoder.get_dense_pe(), sparse,
            dense, mask_out_idxs=mask_out_idxs)

        # upscale from 4x-embedding res to input res (matmul resize:
        # exact jax.image.resize semantics, matmul fwd AND bwd — no
        # scatter-add VJP; ops/upsample.py)
        masks = resize_bilinear(masks, (self.image_size, self.image_size),
                                spatial_axes=(2, 3))
        if self.sigmoid_out:
            masks = jax.nn.sigmoid(masks)
        if self.binary_mask_out:
            masks = (masks > self.mask_threshold).astype(jnp.float32)
        return masks, iou_preds

    def forward_matting(self, batch_images, batch_prompts,
                        train: bool = False):
        """Decoder-resolution forward for the matting fusion head (reference
        sam_matting1.py:375-415): returns (masks [B,4,S/4,S/4], iou [B,4],
        feat3 = image embedding [B,S/16,S/16,C], feat1 = upscaled mask
        feature [B,S/4,S/4,C/8])."""
        image_embeddings = self.encode_image(batch_images, train)
        sparse, dense = self.prompt_encoder(
            points=batch_prompts.get("prompt_point"),
            boxes=batch_prompts.get("prompt_box"),
            masks=batch_prompts.get("prompt_mask"))
        if self.frozen_prompt_encoder:
            sparse = jax.lax.stop_gradient(sparse)
            dense = jax.lax.stop_gradient(dense)
        masks, iou_preds, upscaled = self.mask_decoder(
            image_embeddings, self.prompt_encoder.get_dense_pe(), sparse,
            dense, mask_out_idxs=(0, 1, 2, 3), return_feats=True)
        return masks, iou_preds, image_embeddings, upscaled


def _sam(defaults, **kwargs):
    cfg = dict(defaults)
    cfg.update(kwargs)
    return SAM(**cfg)


@MODELS.register()
def sam_b(**kwargs):
    return _sam(dict(image_encoder_embedding_planes=768,
                     image_encoder_block_nums=12, image_encoder_head_nums=12,
                     image_encoder_global_attn_indexes=(2, 5, 8, 11)),
                **kwargs)


@MODELS.register()
def sam_l(**kwargs):
    return _sam(dict(image_encoder_embedding_planes=1024,
                     image_encoder_block_nums=24, image_encoder_head_nums=16,
                     image_encoder_global_attn_indexes=(5, 11, 17, 23)),
                **kwargs)


@MODELS.register()
def sam_h(**kwargs):
    return _sam(dict(image_encoder_embedding_planes=1280,
                     image_encoder_block_nums=32, image_encoder_head_nums=16,
                     image_encoder_global_attn_indexes=(7, 15, 23, 31)),
                **kwargs)
