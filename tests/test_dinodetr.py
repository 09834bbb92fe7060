"""DINO-DETR: forward shapes (train with denoising + eval), loss finiteness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.losses.dinodetr import DINODETRLoss


@pytest.fixture(scope="module")
def tiny_dino():
    model = MODELS.create(
        "resnet18_dinodetr", num_classes=8, query_nums=20,
        encoder_layer_nums=1, decoder_layer_nums=2, hidden_inplanes=64,
        feedforward_planes=128, dn_groups=2, max_dn_gt=3)
    x = jnp.zeros((2, 128, 128, 3))
    ann = np.full((2, 3, 5), -1.0, np.float32)
    ann[0, 0] = [0.5, 0.5, 0.2, 0.2, 3]
    ann[1, 0] = [0.3, 0.3, 0.1, 0.2, 1]
    ann[1, 1] = [0.7, 0.6, 0.2, 0.1, 5]
    ann = jnp.asarray(ann)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dn": jax.random.PRNGKey(1)}, x, ann, True)
    return model, variables, x, ann


def test_dino_train_forward_with_dn(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs, _ = model.apply(variables, x, ann, True,
                          rngs={"dn": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    assert outs["pred_logits"].shape == (2, 20, 8)
    assert outs["pred_boxes"].shape == (2, 20, 4)
    assert outs["dn_pred_logits"].shape[2] == 2 * 2 * 3  # groups*2*max_dn_gt
    assert outs["interm_pred_logits"].shape == (2, 20, 8)
    assert np.isfinite(np.asarray(outs["pred_boxes"])).all()


def test_dino_eval_forward(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs = model.apply(variables, x, None, False)
    assert "dn_pred_logits" not in outs
    assert outs["pred_logits"].shape == (2, 20, 8)


def test_dino_loss(tiny_dino):
    model, variables, x, ann = tiny_dino
    outs, _ = model.apply(variables, x, ann, True,
                          rngs={"dn": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
    loss = DINODETRLoss(num_classes=8)(outs, ann)
    assert "cls_loss" in loss and "dn_cls_loss" in loss and \
        "interm_cls_loss" in loss
    for k, v in loss.items():
        assert np.isfinite(float(v)), k
