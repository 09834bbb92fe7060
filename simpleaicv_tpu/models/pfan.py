"""PFAN family — salient-object detection, human matting, face/human parsing.

Parity:
  * PFANSegmentation (reference
    simpleAICV/salient_object_detection/models/pfan_segmentation.py:155 —
    CPFE high-level features on C3/C4, 3x3 low-level convs on C1/C2, fuse at
    C1 res, 2x transposed-conv upsampling x2, 1-channel sigmoid pred);
  * PFANMatting (reference simpleAICV/human_matting/models/pfan_matting.py:157
    — global trimap branch (3-ch sigmoid) + local alpha branch (1-ch sigmoid)
    + collaborative fusion: fused = local*1[argmax==1] + 1[argmax==2]);
  * PFANParsing (reference simpleAICV/face_parsing/models/pfan_face_parsing.py
    / human_parsing — same decoder with num_classes logits).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES, MODELS
from .common import ConvBnAct, cdtype
from .detection.fpn import _upsample_to

__all__ = ["PFANSegmentation", "PFANMatting", "PFANParsing"]


class CPFE(nn.Module):
    """Context-aware pyramid feature extraction: 1x1 + dilated 3x3 (3/5/7)."""
    planes: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def dil_conv(d, name):
            return nn.Conv(self.planes, (3, 3), padding=[(d, d), (d, d)],
                           kernel_dilation=(d, d), use_bias=False,
                           dtype=cdtype(), param_dtype=jnp.float32,
                           name=name)

        x1 = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=cdtype(),
                     param_dtype=jnp.float32, name="conv_1_1")(x)
        x3 = dil_conv(3, "conv_dil_3")(x)
        x5 = dil_conv(5, "conv_dil_5")(x)
        x7 = dil_conv(7, "conv_dil_7")(x)
        x = jnp.concatenate([x1, x3, x5, x7], axis=-1)
        return ConvBnAct(self.planes, 3, name="conv")(x, train)


class ConvTBnAct(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.planes, (2, 2), strides=(2, 2),
                             use_bias=False, dtype=cdtype(),
                             param_dtype=jnp.float32, name="convt")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(cdtype()))


class _PFANDecoder(nn.Module):
    """Shared PFAN decoder: (C1..C4) -> fused C1-res feature -> 4x upsample.

    ``cross`` implements the matting local branch's fusion with the global
    branch (reference human_matting/models/pfan_matting.py:439-461: the local
    high feature is concatenated with the global one, and the reduce conv
    additionally sees the global low feature — 128 input channels)."""
    cpfe_planes: int = 32
    prefix: str = ""

    @nn.compact
    def __call__(self, features, train: bool = False, cross=None):
        c1, c2, c3, c4 = features
        h1, w1 = c1.shape[1], c1.shape[2]
        f4 = CPFE(self.cpfe_planes, name="high_level_cpfe_4")(c4, train)
        f3 = CPFE(self.cpfe_planes, name="high_level_cpfe_3")(c3, train)
        f4 = _upsample_to(f4, c3.shape[1], c3.shape[2])
        high = ConvBnAct(self.cpfe_planes, 1, has_act=False,
                         name="high_level_conv")(
            jnp.concatenate([f3, f4], -1), train)
        high = _upsample_to(high, h1, w1)
        mid = {"conv_34": high}
        if cross is not None:
            high = jnp.concatenate([high, cross["conv_34"]], -1)

        f1 = ConvBnAct(self.cpfe_planes, 3, name="low_level_conv_1")(c1, train)
        f2 = ConvBnAct(self.cpfe_planes, 3, name="low_level_conv_2")(c2, train)
        f2 = _upsample_to(f2, h1, w1)
        low = ConvBnAct(self.cpfe_planes, 1, has_act=False,
                        name="low_level_conv")(
            jnp.concatenate([f1, f2], -1), train)
        mid["conv_12"] = low

        if cross is None:
            fused = jnp.concatenate([low, high], -1)
        else:
            fused = jnp.concatenate([low, cross["conv_12"], high], -1)
        x = ConvBnAct(self.cpfe_planes, 1, has_act=False,
                      name="reduce_conv1")(fused, train)
        x = ConvTBnAct(self.cpfe_planes, name="upsample_conv1")(x, train)
        x = ConvBnAct(self.cpfe_planes, 3, name="upsample_conv2")(x, train)
        x = ConvTBnAct(self.cpfe_planes, name="upsample_conv3")(x, train)
        return x, mid


def _pred_conv(planes, name):
    return nn.Conv(planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                   dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class PFANSegmentation(nn.Module):
    backbone_type: str
    cpfe_planes: int = 32
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.decoder = _PFANDecoder(cpfe_planes=self.cpfe_planes)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        x, _ = self.decoder(feats, train)
        pred = _pred_conv(1, "pred_conv")(x.astype(jnp.float32))
        return nn.sigmoid(pred)


class PFANParsing(nn.Module):
    backbone_type: str
    num_classes: int = 19
    cpfe_planes: int = 32
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.decoder = _PFANDecoder(cpfe_planes=self.cpfe_planes)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        x, _ = self.decoder(feats, train)
        return _pred_conv(self.num_classes, "pred_conv")(
            x.astype(jnp.float32))


class PFANMatting(nn.Module):
    backbone_type: str
    cpfe_planes: int = 32
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.global_decoder = _PFANDecoder(cpfe_planes=self.cpfe_planes)
        self.local_decoder = _PFANDecoder(cpfe_planes=self.cpfe_planes)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        g, g_mid = self.global_decoder(feats, train)
        l, _ = self.local_decoder(feats, train, cross=g_mid)
        global_pred = nn.sigmoid(_pred_conv(3, "global_pred_conv")(
            g.astype(jnp.float32)))
        local_pred = nn.sigmoid(_pred_conv(1, "local_pred_conv")(
            l.astype(jnp.float32)))
        fused = self.collaborative_matting(global_pred, local_pred)
        return global_pred, local_pred, fused

    @staticmethod
    def collaborative_matting(global_pred, local_pred):
        """fused = local in trimap-'unknown' region + 1 in fg region
        (reference pfan_matting.py:484-504; classes 0 bg / 1 unknown / 2 fg)."""
        max_idx = jnp.argmax(global_pred, axis=-1)[..., None]
        trimap_mask = (max_idx == 1).astype(local_pred.dtype)
        fg_mask = (max_idx == 2).astype(local_pred.dtype)
        return local_pred * trimap_mask + fg_mask


def _register_pfan_variants():
    backbones = {
        "resnet18": "resnet18", "resnet34": "resnet34",
        "resnet50": "resnet50", "resnet101": "resnet101",
        "resnet152": "resnet152",
        "vanb0": "van_b0", "vanb1": "van_b1", "vanb2": "van_b2",
        "vanb3": "van_b3",
        "convformers18": "convformer_s18", "convformers36": "convformer_s36",
        "convformerm36": "convformer_m36", "convformerb36": "convformer_b36",
    }
    for ref_name, bb in backbones.items():
        for task, cls in [("segmentation", PFANSegmentation),
                          ("matting", PFANMatting),
                          ("face_parsing", PFANParsing),
                          ("human_parsing", PFANParsing)]:
            name = f"{ref_name}_pfan_{task}"

            def factory(backbone_type=bb, _cls=cls, **kwargs):
                kwargs.pop("backbone_pretrained_path", None)
                kwargs.pop("planes", None)
                return _cls(backbone_type=backbone_type, **kwargs)

            MODELS.register(name)(factory)


_register_pfan_variants()
