"""Torch-checkpoint conversion round trip: build a tiny torch model matching
our ResNet block layout, save a .pth, convert, and check values/layouts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.weight_convert import (convert_torch_checkpoint,
                                                load_torch_state_dict,
                                                torch_tensor_to_jax)

torch = pytest.importorskip("torch")


def test_tensor_layout_conversion():
    conv = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)
    out = torch_tensor_to_jax("x.conv.weight", conv)
    assert out.shape == (4, 5, 3, 2)  # OIHW -> HWIO
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert torch_tensor_to_jax("x.fc.weight", lin).shape == (3, 2)


def test_checkpoint_round_trip(tmp_path):
    tm = torch.nn.Sequential()
    tm.add_module("conv", torch.nn.Conv2d(3, 8, 3, bias=False))
    tm.add_module("bn", torch.nn.BatchNorm2d(8))
    tm.add_module("fc", torch.nn.Linear(8, 4))
    path = str(tmp_path / "model.pth")
    torch.save(tm.state_dict(), path)

    sd = load_torch_state_dict(path)
    assert "conv.weight" in sd

    model_params = {
        "conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
        "bn": {"kernel": jnp.zeros((8,)), "bias": jnp.zeros((8,)),
               "mean": jnp.zeros((8,)), "var": jnp.ones((8,))},
        "fc": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))},
    }
    new_params, n = convert_torch_checkpoint(path, model_params)
    assert n >= 5
    np.testing.assert_allclose(
        np.asarray(new_params["conv"]["kernel"]),
        sd["conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(new_params["fc"]["kernel"]),
                               sd["fc.weight"].T)
