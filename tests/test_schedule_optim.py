"""Schedule shape + optimizer group semantics vs the reference's Scheduler /
build_optimizer (tools/utils.py:188-582)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.schedule import SchedulerConfig, lr_at_epoch
from simpleaicv_tpu.core.optim import OptimizerConfig, per_leaf_hyperparams


def ref_lr(scheduler, lr, epochs, warm, epoch, milestones=(), gamma=0.1,
           power=0.9, min_lr=0.0):
    """Literal re-statement of the reference schedule formulas
    (tools/utils.py:225-247) for golden comparison."""
    if warm > 0 and epoch < warm:
        return epoch / warm * lr
    if scheduler == "MultiStepLR":
        return gamma**len([m for m in milestones if m <= epoch]) * lr
    if scheduler == "CosineLR":
        return 0.5 * (math.cos(
            (epoch - warm) / (epochs - warm) * math.pi) + 1) * (lr - min_lr) + min_lr
    if scheduler == "PolyLR":
        return ((1 - (epoch - warm) / (epochs - warm))**power) * (lr - min_lr) + min_lr


def test_cosine_matches_reference():
    cfg = SchedulerConfig(scheduler="CosineLR", lr=0.1, epochs=100,
                          warm_up_epochs=5)
    for e in [0.0, 0.5, 2.5, 5.0, 37.3, 99.9, 100.0]:
        ours = float(lr_at_epoch(cfg, e))
        ref = ref_lr("CosineLR", 0.1, 100, 5, e)
        assert abs(ours - ref) < 1e-6, (e, ours, ref)


def test_multistep_matches_reference():
    cfg = SchedulerConfig(scheduler="MultiStepLR", lr=0.1, epochs=100,
                          warm_up_epochs=0, milestones=(30, 60, 90), gamma=0.1)
    for e in [0.0, 1.0, 29.9, 30.0, 59.9, 60.0, 95.0]:
        ours = float(lr_at_epoch(cfg, e))
        ref = ref_lr("MultiStepLR", 0.1, 100, 0, e, milestones=(30, 60, 90))
        assert abs(ours - ref) < 1e-7, (e, ours, ref)


def test_poly_matches_reference():
    cfg = SchedulerConfig(scheduler="PolyLR", lr=0.01, epochs=80,
                          warm_up_epochs=1, power=0.9)
    for e in [0.0, 0.5, 1.0, 40.0, 79.5]:
        ours = float(lr_at_epoch(cfg, e))
        ref = ref_lr("PolyLR", 0.01, 80, 1, e)
        assert abs(ours - ref) < 1e-7, (e, ours, ref)


def test_wd_masking_and_sublayer_overrides():
    params = {
        "stem": {"conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
                 "bn": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))}},
        "fc": {"kernel": jnp.zeros((8, 10)), "bias": jnp.zeros((10,))},
    }
    cfg = OptimizerConfig(name="SGD", lr=0.1, weight_decay=1e-4,
                          global_weight_decay=False,
                          sub_layer_lr={"fc": 0.01})
    scales, wds, table = per_leaf_hyperparams(cfg, params)
    # 1-D params get wd 0 (reference tools/utils.py:344-352)
    assert wds["stem"]["bn"]["scale"] == 0.0
    assert wds["stem"]["bn"]["bias"] == 0.0
    assert wds["fc"]["bias"] == 0.0
    assert wds["stem"]["conv"]["kernel"] == 1e-4
    assert wds["fc"]["kernel"] == 1e-4
    # sublayer lr override
    assert abs(scales["fc"]["kernel"] - 0.1) < 1e-9  # 0.01 / 0.1
    assert abs(scales["stem"]["conv"]["kernel"] - 1.0) < 1e-9


def test_vit_layer_decay_scales():
    params = {
        "patch_embedding": {"kernel": jnp.zeros((2, 2, 3, 8))},
        "position_encoding": jnp.zeros((1, 5, 8)),
        "blocks_0": {"fc": {"kernel": jnp.zeros((8, 8))}},
        "blocks_1": {"fc": {"kernel": jnp.zeros((8, 8))}},
        "norm": {"scale": jnp.zeros((8,))},
    }
    cfg = OptimizerConfig(name="AdamW", lr=1e-3, weight_decay=0.05,
                          lr_layer_decay=0.75, lr_layer_decay_block_nums=2,
                          block_name="blocks")
    scales, wds, _ = per_leaf_hyperparams(cfg, params)
    num_layers = 3
    expect = [0.75**(num_layers - i) for i in range(num_layers + 1)]
    assert abs(scales["patch_embedding"]["kernel"] - expect[0]) < 1e-9
    assert abs(scales["position_encoding"] - expect[0]) < 1e-9
    assert abs(scales["blocks_0"]["fc"]["kernel"] - expect[1]) < 1e-9
    assert abs(scales["blocks_1"]["fc"]["kernel"] - expect[2]) < 1e-9
    assert abs(scales["norm"]["scale"] - 1.0) < 1e-9


def test_frozen_layer_updates_are_zero():
    """frozen_layer_name_list forces exact-zero updates even under AdamW's
    decoupled weight decay and a min_lr-floored cosine schedule."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.schedule import SchedulerConfig

    params = {"teacher": {"w": jnp.ones((4, 4))},
              "student": {"w": jnp.ones((4, 4))}}
    cfg = OptimizerConfig(name="AdamW", lr=1e-3, weight_decay=1e-2,
                          global_weight_decay=True,
                          frozen_layer_name_list=("teacher",))
    sched = SchedulerConfig(scheduler="CosineLR", lr=1e-3, epochs=10,
                            min_lr=1e-6)
    tx, table = build_optimizer(cfg, sched, 10, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["teacher"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["student"]["w"]).max()) > 0.0
