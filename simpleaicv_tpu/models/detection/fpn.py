"""RetinaFPN (parity: reference simpleAICV/detection/models/fpn.py:14-88 —
P3-P7 from C3-C5; P6 from C5 (or P5), P7 = relu+conv stride 2)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..common import cdtype


def _conv(planes, k, stride=1, name=None):
    pad = (k - 1) // 2
    return nn.Conv(planes, (k, k), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=True,
                   dtype=cdtype(), param_dtype=jnp.float32, name=name)


def _upsample_to(x, h, w):
    """Bilinear NHWC resize, align_corners=True (matches reference
    F.interpolate). Matmul formulation (ops/upsample.py): the previous
    gather-based version had a scatter-add VJP, serialized on TPU."""
    from ...ops.upsample import resize_bilinear
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return resize_bilinear(x, (h, w), spatial_axes=(1, 2),
                           align_corners=True)


class RetinaFPN(nn.Module):
    planes: int = 256
    use_p5: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        c3, c4, c5 = inputs
        p5 = _conv(self.planes, 1, name="P5_1")(c5)
        p4 = _conv(self.planes, 1, name="P4_1")(c4)
        p4 = _upsample_to(p5, p4.shape[1], p4.shape[2]) + p4
        p3 = _conv(self.planes, 1, name="P3_1")(c3)
        p3 = _upsample_to(p4, p3.shape[1], p3.shape[2]) + p3

        p5 = _conv(self.planes, 3, name="P5_2")(p5)
        p4 = _conv(self.planes, 3, name="P4_2")(p4)
        p3 = _conv(self.planes, 3, name="P3_2")(p3)

        p6 = _conv(self.planes, 3, 2, name="P6")(p5 if self.use_p5 else c5)
        p7 = _conv(self.planes, 3, 2, name="P7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
