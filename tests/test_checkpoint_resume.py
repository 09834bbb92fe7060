"""Checkpoint manager: latest save/restore round trip, best params, partial
load with pos-embed resize (reference load_state_dict parity)."""

import numpy as np
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.checkpoint import (CheckpointManager,
                                            load_state_dict_partial)


def test_latest_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7, jnp.int32)}
    mgr.save_latest(3, state, {"best_metric": 0.5, "time": 1.0})

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    epoch, restored, extra = mgr.restore_latest(
        abstract, {"best_metric": 0.0, "time": 0.0})
    assert epoch == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert extra["best_metric"] == 0.5


def test_best_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    params = {"w": jnp.ones((2, 2))}
    mgr.save_best(params, 42.0)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    restored, metric = mgr.restore_best(abstract)
    assert metric == 42.0
    np.testing.assert_allclose(np.asarray(restored["w"]), 1.0)


def test_partial_load_shape_filter_and_pos_embed():
    saved = {
        "fc": {"kernel": jnp.ones((4, 10))},
        "conv": {"kernel": jnp.ones((3, 3, 3, 8))},
        "position_encoding": jnp.ones((1, 5, 6)),   # 2x2 grid + cls
        "mismatch": {"kernel": jnp.ones((7, 7))},
    }
    target = {
        "fc": {"kernel": jnp.zeros((4, 10))},
        "conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
        "position_encoding": jnp.zeros((1, 17, 6)),  # 4x4 grid + cls
        "mismatch": {"kernel": jnp.zeros((3, 3))},   # dropped (shape)
        "extra": jnp.zeros((2,)),                    # untouched
    }
    out, n = load_state_dict_partial(saved, target)
    assert n == 3
    np.testing.assert_allclose(np.asarray(out["fc"]["kernel"]), 1.0)
    assert out["position_encoding"].shape == (1, 17, 6)
    np.testing.assert_allclose(np.asarray(out["position_encoding"]), 1.0,
                               atol=1e-5)  # bicubic of constant = constant
    np.testing.assert_allclose(np.asarray(out["mismatch"]["kernel"]), 0.0)
