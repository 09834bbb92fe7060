"""DETR: model shapes, Hungarian-matched loss finiteness + matching golden
check on a constructed case, decoder contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.losses.detr import DETRLoss


@pytest.fixture(scope="module")
def detr_outs():
    model = MODELS.create("resnet18_detr", num_classes=8, query_nums=12,
                          encoder_layer_nums=2, decoder_layer_nums=2,
                          hidden_inplanes=64, dropout_prob=0.0)
    x = jnp.zeros((2, 128, 128, 3))
    masks = jnp.zeros((2, 128, 128))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, masks, False)
    outs = model.apply(variables, x, masks, False)
    return outs


def test_detr_shapes(detr_outs):
    cls_out, reg_out = detr_outs
    assert cls_out.shape == (2, 2, 12, 9)
    assert reg_out.shape == (2, 2, 12, 4)
    assert (np.asarray(reg_out) >= 0).all() and (np.asarray(reg_out) <= 1).all()


def test_detr_loss_and_matching(detr_outs):
    ann = np.full((2, 5, 5), -1.0, np.float32)
    ann[0, 0] = [0.5, 0.5, 0.2, 0.2, 3]   # cxcywh normalized
    ann[0, 1] = [0.2, 0.3, 0.1, 0.1, 1]
    ann[1, 0] = [0.7, 0.7, 0.3, 0.3, 5]
    loss = DETRLoss(num_classes=8)(detr_outs, jnp.asarray(ann))
    assert len(loss) == 2 * 3
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


def test_hungarian_matching_prefers_exact():
    # craft predictions where query 2 exactly predicts the gt
    q, c = 4, 5
    cls = np.full((1, 1, q, c + 1), 0.0, np.float32)
    cls[0, 0, 2, 3] = 10.0  # query 2 strongly predicts class 3
    reg = np.full((1, 1, q, 4), 0.5, np.float32)
    reg[0, 0, 2] = [0.25, 0.25, 0.1, 0.1]
    ann = np.full((1, 3, 5), -1.0, np.float32)
    ann[0, 0] = [0.25, 0.25, 0.1, 0.1, 3]
    loss_obj = DETRLoss(num_classes=c)
    matched = np.asarray(loss_obj._match(jnp.asarray(cls[0]),
                                         jnp.asarray(reg[0]),
                                         jnp.asarray(ann)))
    assert matched[0, 2] == 0            # query 2 matched to gt 0
    assert (matched[0, [0, 1, 3]] == -1).all()


def test_detr_decoder(detr_outs):
    decoder = DECODERS.create("DETRDecoder", num_classes=8, max_object_num=10)
    scores, classes, boxes = decoder(detr_outs, [[128, 128], [128, 128]])
    assert scores.shape == (2, 10)
    assert boxes.shape == (2, 10, 4)
