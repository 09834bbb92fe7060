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

__all__ = ["CTCModel", "BiLSTMEncoder", "TransformerEncoder", "CTCPredictor"]


class BiLSTMEncoder(nn.Module):
    """Bidirectional LSTM, hidden = inplanes//2 each way, output projected
    back to inplanes (parity: encoder.py:18-49)."""
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hidden = self.hidden or c // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), name="lstm_fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(hidden), reverse=True,
                     keep_order=True, name="lstm_bwd")(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(c, name="proj")(h)


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
