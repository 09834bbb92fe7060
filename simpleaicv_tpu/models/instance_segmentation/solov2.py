"""SOLOv2 (parity: reference
simpleAICV/instance_segmentation/models/solov2.py:36-584 — P2-P6 FPN, fused
mask-feature head with coord channels on the deepest level, per-level
kernel/category heads on fixed S x S grids)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from ..common import cdtype

from ...core.registry import BACKBONES, MODELS
from ..detection.fpn import _upsample_to

__all__ = ["SOLOV2", "resnet18_solov2", "resnet34_solov2", "resnet50_solov2",
           "resnet101_solov2", "resnet152_solov2", "vanb2_solov2",
           "convformerm36_solov2"]


def _conv(planes, k=3, name=None, bias=True):
    pad = (k - 1) // 2
    return nn.Conv(planes, (k, k), padding=[(pad, pad), (pad, pad)],
                   use_bias=bias, dtype=cdtype(),
                   param_dtype=jnp.float32, name=name)


class ConvGnAct(nn.Module):
    planes: int
    kernel_size: int = 3
    has_act: bool = True

    @nn.compact
    def __call__(self, x):
        x = _conv(self.planes, self.kernel_size, name="conv", bias=False)(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         name="gn")(x)
        x = x.astype(cdtype())
        return nn.relu(x) if self.has_act else x


def _coord_features(x):
    b, h, w, _ = x.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gx, gy = jnp.meshgrid(xs, ys)
    coord = jnp.stack([gx, gy], axis=-1)[None]
    coord = jnp.broadcast_to(coord, (b, h, w, 2)).astype(x.dtype)
    return jnp.concatenate([x, coord], axis=-1)


class SOLOV2FPN(nn.Module):
    planes: int = 256

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        laterals = [
            nn.Conv(self.planes, (1, 1), use_bias=True, dtype=cdtype(),
                    param_dtype=jnp.float32,
                    name=f"lateral_{i}")(c) for i, c in enumerate(inputs)]
        for i in range(len(inputs) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_to(
                laterals[i], laterals[i - 1].shape[1],
                laterals[i - 1].shape[2])
        outs = [
            _conv(self.planes, 3, name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)]
        outs.append(outs[-1][:, ::2, ::2, :])  # stride-2 1x1 maxpool
        return outs


class SOLOV2MaskFeatHead(nn.Module):
    planes: int = 128
    num_classes: int = 256

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        h0, w0 = inputs[0].shape[1], inputs[0].shape[2]
        fused = ConvGnAct(self.planes, name="level_0_conv1")(inputs[0])
        x1 = ConvGnAct(self.planes, name="level_1_conv1")(inputs[1])
        fused = fused + _upsample_to(x1, h0, w0)
        x2 = ConvGnAct(self.planes, name="level_2_conv1")(inputs[2])
        x2 = _upsample_to(x2, inputs[1].shape[1], inputs[1].shape[2])
        x2 = ConvGnAct(self.planes, name="level_2_conv2")(x2)
        fused = fused + _upsample_to(x2, h0, w0)
        x3 = _coord_features(inputs[3])
        x3 = ConvGnAct(self.planes, name="level_3_conv1")(x3)
        x3 = _upsample_to(x3, inputs[2].shape[1], inputs[2].shape[2])
        x3 = ConvGnAct(self.planes, name="level_3_conv2")(x3)
        x3 = _upsample_to(x3, inputs[1].shape[1], inputs[1].shape[2])
        x3 = ConvGnAct(self.planes, name="level_3_conv3")(x3)
        fused = fused + _upsample_to(x3, h0, w0)
        return ConvGnAct(self.num_classes, 1, name="pred_conv")(fused)


class SOLOV2BboxHead(nn.Module):
    inter_planes: int = 512
    instance_planes: int = 256
    stacked_conv_nums: int = 4
    grid_nums: Sequence[int] = (40, 36, 24, 16, 12)
    num_classes: int = 80

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        import math
        p2, p3, p4, p5, p6 = inputs
        p2 = _upsample_to(p2, p3.shape[1], p3.shape[2])
        p6 = _upsample_to(p6, p5.shape[1], p5.shape[2])
        features = [p2, p3, p4, p5, p6]

        prior_bias = -math.log((1 - 0.01) / 0.01)
        # towers/pred convs are SHARED across levels (reference ModuleLists
        # applied per level) — instantiate once, call per level
        kernel_convs = [ConvGnAct(self.inter_planes, name=f"kernel_conv_{j}")
                        for j in range(self.stacked_conv_nums)]
        cate_convs = [ConvGnAct(self.inter_planes, name=f"cate_conv_{j}")
                      for j in range(self.stacked_conv_nums)]
        kernel_pred_conv = _conv(self.instance_planes, 3,
                                 name="kernel_pred_conv")
        cate_pred_conv = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(prior_bias),
            kernel_init=nn.initializers.normal(0.01), dtype=jnp.float32,
            param_dtype=jnp.float32, name="cate_pred_conv")

        kernel_preds, cate_preds = [], []
        for i, f in enumerate(features):
            g = self.grid_nums[i]
            kf = _coord_features(f)
            kf = _upsample_to(kf, g, g)
            cf = kf[..., :-2]
            for j in range(self.stacked_conv_nums):
                kf = kernel_convs[j](kf)
                cf = cate_convs[j](cf)
            kernel_preds.append(kernel_pred_conv(kf).astype(jnp.float32))
            cate_preds.append(cate_pred_conv(cf.astype(jnp.float32)))
        return kernel_preds, cate_preds


class SOLOV2(nn.Module):
    backbone_type: str
    fpn_planes: int = 256
    mask_feature_planes: int = 128
    mask_feature_num_classes: int = 256
    bbox_inter_planes: int = 512
    instance_planes: int = 256
    grid_nums: Sequence[int] = (40, 36, 24, 16, 12)
    num_classes: int = 80
    use_gradient_checkpoint: bool = False

    def setup(self):
        self.backbone = BACKBONES.create(
            self.backbone_type, features_only=True,
            use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.fpn = SOLOV2FPN(planes=self.fpn_planes)
        self.mask_feature_head = SOLOV2MaskFeatHead(
            planes=self.mask_feature_planes,
            num_classes=self.mask_feature_num_classes)
        self.bbox_head = SOLOV2BboxHead(
            inter_planes=self.bbox_inter_planes,
            instance_planes=self.instance_planes, grid_nums=self.grid_nums,
            num_classes=self.num_classes)

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        feats = self.fpn(feats, train)
        mask_feat = self.mask_feature_head(feats[0:4], train)
        kernel_preds, cate_preds = self.bbox_head(feats, train)
        return mask_feat, kernel_preds, cate_preds


def _solov2(backbone_type, **kwargs):
    kwargs.pop("backbone_pretrained_path", None)
    return SOLOV2(backbone_type=backbone_type, **kwargs)


@MODELS.register()
def resnet18_solov2(**kwargs):
    return _solov2("resnet18", **kwargs)


@MODELS.register()
def resnet34_solov2(**kwargs):
    return _solov2("resnet34", **kwargs)


@MODELS.register()
def resnet50_solov2(**kwargs):
    return _solov2("resnet50", **kwargs)


@MODELS.register()
def resnet101_solov2(**kwargs):
    return _solov2("resnet101", **kwargs)


@MODELS.register()
def resnet152_solov2(**kwargs):
    return _solov2("resnet152", **kwargs)


@MODELS.register()
def vanb2_solov2(**kwargs):
    return _solov2("van_b2", **kwargs)


@MODELS.register()
def convformerm36_solov2(**kwargs):
    return _solov2("convformer_m36", **kwargs)
