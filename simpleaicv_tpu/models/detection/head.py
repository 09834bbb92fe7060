"""Detection heads (parity: reference
simpleAICV/detection/models/head.py:15-183 — 4-conv towers, sigmoid cls with
prior-bias init, FCOS variant with GroupNorm + centerness)."""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
from ..common import acc_dtype, cdtype

PRIOR_BIAS = -math.log((1 - 0.01) / 0.01)


def _conv(planes, use_bias=True, bias_init=0.0, name=None):
    return nn.Conv(planes, (3, 3), padding=[(1, 1), (1, 1)],
                   use_bias=use_bias,
                   kernel_init=nn.initializers.normal(0.01),
                   bias_init=nn.initializers.constant(bias_init),
                   dtype=cdtype(), param_dtype=jnp.float32, name=name)


class RetinaClsHead(nn.Module):
    num_anchors: int
    num_classes: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        for i in range(self.num_layers):
            x = nn.relu(_conv(planes, name=f"cls_head_{i}")(x))
        x = _conv(self.num_anchors * self.num_classes, bias_init=PRIOR_BIAS,
                  name="cls_out")(x)
        return nn.sigmoid(x.astype(acc_dtype()))


class RetinaRegHead(nn.Module):
    num_anchors: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        for i in range(self.num_layers):
            x = nn.relu(_conv(planes, name=f"reg_head_{i}")(x))
        return _conv(self.num_anchors * 4, name="reg_out")(x)


class FCOSClsRegCntHead(nn.Module):
    num_classes: int
    num_layers: int = 4
    use_gn: bool = True
    cnt_on_reg: bool = True

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        cls_x = x
        for i in range(self.num_layers):
            cls_x = _conv(planes, use_bias=not self.use_gn,
                          name=f"cls_head_{i}")(cls_x)
            if self.use_gn:
                cls_x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     dtype=acc_dtype(),
                                     name=f"cls_gn_{i}")(cls_x)
                cls_x = cls_x.astype(cdtype())
            cls_x = nn.relu(cls_x)
        reg_x = x
        for i in range(self.num_layers):
            reg_x = _conv(planes, use_bias=not self.use_gn,
                          name=f"reg_head_{i}")(reg_x)
            if self.use_gn:
                reg_x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     dtype=acc_dtype(),
                                     name=f"reg_gn_{i}")(reg_x)
                reg_x = reg_x.astype(cdtype())
            reg_x = nn.relu(reg_x)

        cls_out = _conv(self.num_classes, bias_init=PRIOR_BIAS,
                        name="cls_out")(cls_x)
        reg_out = _conv(4, name="reg_out")(reg_x)
        cnt_out = _conv(1, name="center_out")(reg_x if self.cnt_on_reg
                                              else cls_x)
        return (nn.sigmoid(cls_out.astype(acc_dtype())), reg_out,
                nn.sigmoid(cnt_out.astype(acc_dtype())))
