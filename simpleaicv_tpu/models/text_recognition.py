"""OCR text-recognition CTC model (parity: reference
simpleAICV/text_recognition/models/ctc_model.py:23 — backbone -> mean over H ->
sequence encoder (BiLSTM:encoder.py:18 / Transformer:encoder.py:168) ->
CTCPredictor:predictor.py:17).

NHWC: feature [B,H,W,C] -> mean over H -> [B,W,C] sequence (no permutes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from .common import cdtype

from ..core.registry import BACKBONES, MODELS
from .backbones.vit import TransformerEncoderLayer

__all__ = ["CTCModel", "BiLSTMEncoder", "TransformerEncoder", "CTCPredictor",
           "OCRResNetBackbone"]


class _OCRBasicBlock(nn.Module):
    """Reference text_recognition/models/backbones/resnet.py:27-77: conv1
    takes the stage's (kernel, stride, padding); conv2 is 3x3/1."""
    planes: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: tuple = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import ConvBnAct
        inplanes = x.shape[-1]
        out = ConvBnAct(self.planes, self.kernel, self.stride, self.padding,
                        name="conv1")(x, train)
        out = ConvBnAct(self.planes, 3, 1, 1, has_act=False,
                        name="conv2")(out, train)
        if max(self.stride) != 1 or inplanes != self.planes:
            x = ConvBnAct(self.planes, 1, self.stride, 0, has_act=False,
                          name="downsample")(x, train)
        return nn.relu(out + x)


class _OCRBottleneck(nn.Module):
    """Reference text_recognition/models/backbones/resnet.py:80-140: the
    stage's (kernel, stride, padding) lands on conv2."""
    planes: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: tuple = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import ConvBnAct
        inplanes = x.shape[-1]
        outplanes = self.planes * 4
        out = ConvBnAct(self.planes, 1, 1, 0, name="conv1")(x, train)
        out = ConvBnAct(self.planes, self.kernel, self.stride, self.padding,
                        name="conv2")(out, train)
        out = ConvBnAct(outplanes, 1, 1, 0, has_act=False,
                        name="conv3")(out, train)
        if max(self.stride) != 1 or inplanes != outplanes:
            x = ConvBnAct(outplanes, 1, self.stride, 0, has_act=False,
                          name="downsample")(x, train)
        return nn.relu(out + x)


# per-stage (kernel, stride, padding) of the first block; stages 3/4 keep
# width: stride (2,1) with (3,1) kernels (reference resnet.py:165-190)
_OCR_STAGE_SPECS = [
    ((3, 3), (1, 1), (1, 1)),
    ((3, 3), (2, 2), (1, 1)),
    ((3, 1), (2, 1), (1, 0)),
    ((3, 1), (2, 1), (1, 0)),
]


class OCRResNetBackbone(nn.Module):
    """Text-recognition ResNet trunk: H/32, W/8 feature map so a 32-high crop
    yields a W/8-long CTC sequence (reference
    text_recognition/models/backbones/resnet.py:142-241)."""
    basic: bool = False
    layer_nums: tuple = (3, 4, 6, 3)
    use_gradient_checkpoint: bool = False
    features_only: bool = True  # always a backbone

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import ConvBnAct, max_pool_same, maybe_remat
        block = _OCRBasicBlock if self.basic else _OCRBottleneck
        block = maybe_remat(block, self.use_gradient_checkpoint)
        x = ConvBnAct(64, 7, 2, 3, name="stem")(x, train)
        x = max_pool_same(x, 3, 2)
        features = []
        planes = 64
        for si, (n, (k, s, p)) in enumerate(zip(self.layer_nums,
                                                _OCR_STAGE_SPECS)):
            for bi in range(n):
                bk, bs, bp = (k, s, p) if bi == 0 else ((3, 3), (1, 1), (1, 1))
                x = block(planes, bk, bs, bp,
                          name=f"layer{si + 1}_{bi}")(x, train)
            features.append(x)
            planes *= 2
        return tuple(features)


_OCR_BACKBONES = {
    "resnet18": dict(basic=True, layer_nums=(2, 2, 2, 2)),
    "resnet34": dict(basic=True, layer_nums=(3, 4, 6, 3)),
    "resnet50": dict(basic=False, layer_nums=(3, 4, 6, 3)),
    "resnet101": dict(basic=False, layer_nums=(3, 4, 23, 3)),
    "resnet152": dict(basic=False, layer_nums=(3, 8, 36, 3)),
}


class BiLSTMEncoder(nn.Module):
    """Two stacked (BiLSTM hidden=inplanes -> Linear 2*inplanes->inplanes)
    blocks (parity: reference text_recognition/models/encoder.py:18-49 —
    rnn1/linear1/rnn2/linear2, LSTM hidden size equals the input width)."""
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hidden = self.hidden or c
        for i in (1, 2):
            fwd = nn.RNN(nn.OptimizedLSTMCell(hidden,
                                              name=f"rnn{i}_fwd"))(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(hidden, name=f"rnn{i}_bwd"),
                         reverse=True, keep_order=True)(x)
            x = nn.Dense(c, name=f"linear{i}")(
                jnp.concatenate([fwd, bwd], axis=-1))
        return x


class TransformerEncoder(nn.Module):
    block_nums: int = 3
    head_nums: int = 8
    feedforward_ratio: int = 4
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(cdtype())
        for i in range(self.block_nums):
            x = TransformerEncoderLayer(self.head_nums,
                                        self.feedforward_ratio,
                                        self.dropout_prob, 0.0,
                                        name=f"blocks_{i}")(x, train)
        return x.astype(jnp.float32)


class CTCPredictor(nn.Module):
    hidden_planes: int = 512
    num_classes: int = 12114

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_planes, name="fc1")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fc2")(x)


_ENCODERS = {"BiLSTMEncoder": BiLSTMEncoder,
             "TransformerEncoder": TransformerEncoder}


class CTCModel(nn.Module):
    backbone_type: str = "resnet50"
    encoder_type: str = "BiLSTMEncoder"
    predictor_hidden_planes: int = 512
    num_classes: int = 12114
    use_gradient_checkpoint: bool = False

    def setup(self):
        if self.backbone_type in _OCR_BACKBONES:
            self.backbone = OCRResNetBackbone(
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                **_OCR_BACKBONES[self.backbone_type])
        else:
            self.backbone = BACKBONES.create(
                self.backbone_type, features_only=True,
                use_gradient_checkpoint=self.use_gradient_checkpoint)
        self.encoder = _ENCODERS[self.encoder_type]()
        self.predictor = CTCPredictor(self.predictor_hidden_planes,
                                      self.num_classes)

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        x = feats[-1]                       # [B,H,W,C]
        x = jnp.mean(x.astype(jnp.float32), axis=1)  # [B,W,C]
        x = self.encoder(x, train)
        return self.predictor(x)            # [B,W,num_classes]


@MODELS.register()
def CTCModelFactory(model_config, use_gradient_checkpoint=False):
    """Accepts the reference's nested model_config dict surface."""
    return CTCModel(
        backbone_type=model_config["backbone"]["name"].replace("backbone", ""),
        encoder_type=model_config["encoder"]["name"],
        predictor_hidden_planes=model_config["predictor"]["param"].get(
            "hidden_planes", 512),
        num_classes=model_config["predictor"]["param"]["num_classes"],
        use_gradient_checkpoint=use_gradient_checkpoint)
