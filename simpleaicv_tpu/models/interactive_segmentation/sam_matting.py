"""SAM-matting models (parity: reference
simpleAICV/interactive_segmentation/models/segment_anything_matting/
sam_matting1.py:309 / sam_matting2.py:307 and the light_segment_anything_
matting variants).

Structure mirrors the reference FUSION head (sam_matting1.py:16-306):
  inputs  masks [B,K,S/4,S/4] (decoder-res mask logits),
          feat3 = image embedding [B,S/16,S/16,256],
          feat1 = decoder upscaled feature [B,S/4,S/4,32]
  global path: reduce(feat3)->up to S/4, reduce(feat1), cat with masks,
          combine/reduce convs, two 2x upsample convs to full res,
          3-channel sigmoid trimap pred
  local path: same with the global reduced feats concatenated in,
          1-channel sigmoid alpha pred
  fused = collaborative matting (argmax trimap gates local alpha).

sam_matting1: ONE fusion head sees all 4 mask levels -> one-level preds,
  iou pred = sigmoid(mean over levels) [B,1]  (sam_matting1.py:411-413).
sam_matting2: one fusion head PER level -> [B,4,...] preds,
  iou pred = sigmoid(iou) [B,4]               (sam_matting2.py:407-426).

TPU-first: NHWC convs (bf16 compute / f32 params), bilinear resize +
conv instead of interpolate+conv pairs, level axis static.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..common import cdtype

from ...core.registry import MODELS
from .sam import SAM
from .light_sam import LightSAM
from ...ops.upsample import resize_bilinear

__all__ = ["SAMMatting", "FusionHead",
           "sam_b_matting1", "sam_l_matting1", "convformer_m36_sam_matting1",
           "sam_b_matting2", "sam_l_matting2", "convformer_m36_sam_matting2"]


def _conv(x, planes, name, kernel=3):
    pad = (kernel - 1) // 2
    return nn.Conv(planes, (kernel, kernel), padding=[(pad, pad), (pad, pad)],
                   dtype=cdtype(), param_dtype=jnp.float32, name=name)(x)


def _up2x(x):
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), spatial_axes=(1, 2))


class FusionHead(nn.Module):
    """Reference FUSION decoder (sam_matting1.py:16-306), NHWC."""
    planes: int = 32

    @nn.compact
    def __call__(self, masks, feat3, feat1):
        # masks [B,h,w,K]; feat3 [B,h/4,w/4,256]; feat1 [B,h,w,32]
        p = self.planes
        h, w = feat1.shape[1], feat1.shape[2]

        f3g = _conv(feat3, p, "global_feat3_reduce")
        f3g = resize_bilinear(f3g, (h, w), spatial_axes=(1, 2))
        f1g = nn.relu(_conv(feat1, p, "global_feat1_reduce"))
        g = jnp.concatenate([f1g, f3g, masks.astype(cdtype())], axis=-1)
        g = nn.relu(_conv(g, 2 * p, "global_combine"))
        g = nn.relu(_conv(g, p, "global_reduce"))
        g = nn.relu(_conv(_up2x(g), p, "global_up1"))
        g = nn.relu(_conv(g, p, "global_up2"))
        g = nn.relu(_conv(_up2x(g), p, "global_up3"))
        global_pred = nn.sigmoid(
            _conv(g, 3, "global_pred").astype(jnp.float32))

        f3l = _conv(feat3, p, "local_feat3_reduce")
        f3l = resize_bilinear(f3l, (h, w), spatial_axes=(1, 2))
        f1l = nn.relu(_conv(feat1, p, "local_feat1_reduce"))
        l = jnp.concatenate([f1l, f3l, f1g, f3g,
                             masks.astype(cdtype())], axis=-1)
        l = nn.relu(_conv(l, 2 * p, "local_combine"))
        l = nn.relu(_conv(l, p, "local_reduce"))
        l = nn.relu(_conv(_up2x(l), p, "local_up1"))
        l = nn.relu(_conv(l, p, "local_up2"))
        l = nn.relu(_conv(_up2x(l), p, "local_up3"))
        local_pred = nn.sigmoid(_conv(l, 1, "local_pred").astype(jnp.float32))

        return global_pred, local_pred        # [B,4h,4w,3], [B,4h,4w,1]


def collaborative_matting(global_pred, local_pred):
    """fused = local alpha where trimap argmax says 'local', 1 where
    'global/fg', 0 where bg (reference sam_matting1.py:417-437)."""
    max_cls = jnp.argmax(global_pred, axis=-1)[..., None]   # [...,1]
    trimap_mask = (max_cls == 1).astype(jnp.float32)
    fg_mask = (max_cls == 2).astype(jnp.float32)
    return local_pred * trimap_mask + fg_mask


class SAMMatting(nn.Module):
    """SAM/LightSAM + fusion matting head(s).

    ``multi_level=False`` == reference sam_matting1 (one head over all mask
    levels, [B,h,w,c] preds + [B,1] iou); ``multi_level=True`` ==
    sam_matting2 (one head per level, [B,4,h,w,c] preds + [B,4] iou).
    """
    sam: nn.Module
    multi_level: bool = False

    @nn.compact
    def __call__(self, batch_images, batch_prompts, train: bool = False):
        masks, ious, feat3, feat1 = self.sam.forward_matting(
            batch_images, batch_prompts, train)
        masks_nhwc = jnp.transpose(masks, (0, 2, 3, 1))     # [B,h,w,4]

        if not self.multi_level:
            g, l = FusionHead(name="fusion_pred")(masks_nhwc, feat3, feat1)
            fused = collaborative_matting(g, l)
            iou = nn.sigmoid(jnp.mean(ious.astype(jnp.float32), axis=1,
                                      keepdims=True))       # [B,1]
            return g, l, fused, iou

        gs, ls = [], []
        for i in range(masks_nhwc.shape[-1]):
            g, l = FusionHead(name=f"fusion_pred_{i}")(
                masks_nhwc[..., i:i + 1], feat3, feat1)
            gs.append(g)
            ls.append(l)
        g = jnp.stack(gs, axis=1)                           # [B,4,H,W,3]
        l = jnp.stack(ls, axis=1)
        fused = collaborative_matting(g, l)
        iou = nn.sigmoid(ious.astype(jnp.float32))          # [B,4]
        return g, l, fused, iou


def _vit_sam(planes, blocks, heads, global_idx, **kwargs):
    return SAM(image_encoder_embedding_planes=planes,
               image_encoder_block_nums=blocks,
               image_encoder_head_nums=heads,
               image_encoder_global_attn_indexes=global_idx, **kwargs)


@MODELS.register()
def sam_b_matting1(**kwargs):
    return SAMMatting(sam=_vit_sam(768, 12, 12, (2, 5, 8, 11), **kwargs))


@MODELS.register()
def sam_l_matting1(**kwargs):
    return SAMMatting(sam=_vit_sam(1024, 24, 16, (5, 11, 17, 23), **kwargs))


@MODELS.register()
def convformer_m36_sam_matting1(**kwargs):
    return SAMMatting(sam=LightSAM(backbone_type="convformer_m36", **kwargs))


def _register_light_sam_matting_variants():
    """Mirror the reference's 8-backbone light-SAM-matting registries
    (light_segment_anything_matting/light_sam_matting{1,2}.py:18-27)."""
    backbones = {
        "vanb0": "van_b0", "vanb1": "van_b1", "vanb2": "van_b2",
        "vanb3": "van_b3", "convformers18": "convformer_s18",
        "convformers36": "convformer_s36", "convformerm36": "convformer_m36",
        "convformerb36": "convformer_b36",
    }
    for short, bb in backbones.items():
        for suffix, multi in (("matting1", False), ("matting2", True)):
            MODELS.register(f"{short}_light_sam_{suffix}")(
                lambda backbone_type=bb, _ml=multi, **kw: SAMMatting(
                    sam=LightSAM(backbone_type=backbone_type, **kw),
                    multi_level=_ml))


_register_light_sam_matting_variants()


@MODELS.register()
def sam_b_matting2(**kwargs):
    return SAMMatting(sam=_vit_sam(768, 12, 12, (2, 5, 8, 11), **kwargs),
                      multi_level=True)


@MODELS.register()
def sam_l_matting2(**kwargs):
    return SAMMatting(sam=_vit_sam(1024, 24, 16, (5, 11, 17, 23), **kwargs),
                      multi_level=True)


@MODELS.register()
def convformer_m36_sam_matting2(**kwargs):
    return SAMMatting(sam=LightSAM(backbone_type="convformer_m36", **kwargs),
                      multi_level=True)
