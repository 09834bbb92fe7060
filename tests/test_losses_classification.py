"""Golden parity tests: our JAX losses vs torch formulations (the reference is
torch, so matching torch.nn.functional on random inputs = matching the
reference's losses, simpleAICV/classification/losses.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from simpleaicv_tpu.losses import (CELoss, FocalCELoss, LabelSmoothCELoss,
                                   OneHotLabelCELoss, KDLoss, DMLLoss, L2Loss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    pred = rng.randn(8, 10).astype(np.float32)
    label = rng.randint(0, 10, size=(8,)).astype(np.int64)
    return pred, label


def test_celoss(data):
    pred, label = data
    ours = float(CELoss()(jnp.asarray(pred), jnp.asarray(label)))
    ref = float(F.cross_entropy(torch.tensor(pred), torch.tensor(label)))
    assert abs(ours - ref) < 1e-5


def test_focal_celoss(data):
    pred, label = data
    ours = float(FocalCELoss(gamma=2.0)(jnp.asarray(pred), jnp.asarray(label)))
    p = F.softmax(torch.tensor(pred), dim=1)
    oh = F.one_hot(torch.tensor(label), 10).float()
    pt = torch.where(oh == 1.0, p, 1.0 - p)
    ref = float(((1 - pt)**2 * (-torch.log(p)) * oh).sum(1).mean())
    assert abs(ours - ref) < 1e-5


def test_label_smooth(data):
    pred, label = data
    ours = float(LabelSmoothCELoss(0.1)(jnp.asarray(pred), jnp.asarray(label)))
    p = F.softmax(torch.tensor(pred), dim=1)
    oh = F.one_hot(torch.tensor(label), 10).float()
    sm = 0.9 * oh + 0.1 / 10
    ref = float(((-torch.log(p)) * sm).sum(1).mean())
    assert abs(ours - ref) < 1e-5


def test_one_hot_ce(data):
    pred, label = data
    oh = np.eye(10, dtype=np.float32)[label]
    ours = float(OneHotLabelCELoss()(jnp.asarray(pred), jnp.asarray(oh)))
    ref = float((-torch.tensor(oh) *
                 F.log_softmax(torch.tensor(pred), dim=-1)).sum(-1).mean())
    assert abs(ours - ref) < 1e-5


def test_kd_loss(data):
    pred, _ = data
    rng = np.random.RandomState(1)
    tea = rng.randn(8, 10).astype(np.float32)
    T = 2.0
    ours = float(KDLoss(T)(jnp.asarray(pred), jnp.asarray(tea)))
    s = torch.clamp(F.softmax(torch.tensor(pred) / T, dim=1), 1e-4, 1 - 1e-4)
    t = torch.clamp(F.softmax(torch.tensor(tea) / T, dim=1), 1e-4, 1 - 1e-4)
    ref = float(F.kl_div(torch.log(s), t, reduction="batchmean") * T * T)
    assert abs(ours - ref) < 1e-5


def test_l2_dml(data):
    pred, _ = data
    rng = np.random.RandomState(1)
    other = rng.randn(8, 10).astype(np.float32)
    l2 = float(L2Loss()(jnp.asarray(pred), jnp.asarray(other)))
    assert abs(l2 - float(np.mean((pred - other)**2))) < 1e-6
    dml = float(DMLLoss(1.0)(jnp.asarray(pred), jnp.asarray(other)))
    assert dml > 0
