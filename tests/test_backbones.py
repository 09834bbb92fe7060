"""Backbone smoke tests: every factory builds, forward gives the right shape
(the TPU-framework analogue of the reference's per-file __main__ smoke blocks,
SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401  (registers the zoo)
from simpleaicv_tpu.core.registry import BACKBONES


def _forward(model, image_hw=32, num_expected=None, train=False):
    x = jnp.zeros((2, image_hw, image_hw, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = model.apply(variables, x, False)
    if num_expected is not None:
        assert out.shape == (2, num_expected)
    return variables, out


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_resnet(name):
    model = BACKBONES.create(name, num_classes=13)
    _forward(model, 64, 13)


def test_resnet_cifar():
    model = BACKBONES.create("resnet18cifar", num_classes=100)
    _forward(model, 32, 100)


def test_vit():
    model = BACKBONES.create("vit_base_patch16", image_size=32, num_classes=7)
    _forward(model, 32, 7)


def test_vit_global_pool():
    model = BACKBONES.create("vit_small_patch14", image_size=28,
                             global_pool=True, num_classes=7)
    _forward(model, 28, 7)


def test_convformer():
    model = BACKBONES.create("convformer_s18", num_classes=9)
    _forward(model, 64, 9)


def test_van():
    model = BACKBONES.create("van_b0", num_classes=9)
    _forward(model, 64, 9)


@pytest.mark.parametrize("name", ["darknettiny", "darknet19", "darknet53"])
def test_darknet(name):
    model = BACKBONES.create(name, num_classes=5)
    _forward(model, 64, 5)


def test_resnet_features_only():
    model = BACKBONES.create("resnet50", features_only=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    feats = model.apply(variables, x, False)
    assert len(feats) == 4
    assert feats[0].shape == (1, 16, 16, 256)   # C2 (stride 4)
    assert feats[3].shape == (1, 2, 2, 2048)    # C5 (stride 32)


def test_gradient_checkpoint_forward_backward():
    model = BACKBONES.create("resnet18cifar", num_classes=10,
                             use_gradient_checkpoint=True)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, True)

    def loss_fn(params):
        out, _ = model.apply({"params": params, **{k: v for k, v in
                              variables.items() if k != "params"}}, x, True,
                             mutable=["batch_stats"])
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    assert jnp.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()
