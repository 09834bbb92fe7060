"""On-device auction matcher vs scipy Hungarian (the reference's matcher,
simpleAICV/detection/losses.py:1050-1079), plus DETRLoss equivalence between
the two matcher backends."""

import numpy as np
import pytest
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.ops.matcher import auction_match_batch

scipy_opt = pytest.importorskip("scipy.optimize")


def test_auction_matches_hungarian_random():
    rng = np.random.RandomState(0)
    b, q, m = 4, 100, 40
    for _ in range(5):
        cost = rng.randn(b, q, m).astype(np.float32) * 3
        valid = np.zeros((b, m), bool)
        for i in range(b):
            valid[i, :rng.randint(1, m + 1)] = True
        masked = np.where(valid[:, None, :], cost, 1e8)
        out = np.asarray(auction_match_batch(jnp.asarray(masked),
                                             jnp.asarray(valid)))
        for i in range(b):
            mv = valid[i]
            rows, cols = scipy_opt.linear_sum_assignment(cost[i][:, mv])
            gt_ids = np.nonzero(mv)[0]
            opt = cost[i][rows, gt_ids[cols]].sum()
            qidx = np.nonzero(out[i] >= 0)[0]
            assert len(qidx) == mv.sum()
            ours = cost[i][qidx, out[i][qidx]].sum()
            # every valid gt matched exactly once
            assert sorted(out[i][qidx].tolist()) == gt_ids.tolist()
            assert ours <= opt + mv.sum() * 2e-3 + 1e-4


def test_auction_contended_stays_near_optimal():
    """Near-duplicate gt columns (crowded scenes) — the adversarial case."""
    rng = np.random.RandomState(1)
    q, m = 100, 30
    base = (rng.randn(q, 3) * 3).astype(np.float32)
    cost = base[:, rng.randint(0, 3, m)] + \
        rng.randn(q, m).astype(np.float32) * 0.05
    valid = np.ones((1, m), bool)
    out = np.asarray(auction_match_batch(
        jnp.asarray(cost[None]), jnp.asarray(valid)))[0]
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    opt = cost[rows, cols].sum()
    qidx = np.nonzero(out >= 0)[0]
    assert len(qidx) == m
    ours = cost[qidx, out[qidx]].sum()
    assert ours <= opt + m * 2e-3 + 1e-3


def test_detr_loss_auction_close_to_hungarian():
    from simpleaicv_tpu.losses.detr import DETRLoss

    rng = np.random.RandomState(2)
    layers, b, qn, nc = 2, 2, 50, 8
    cls = rng.randn(layers, b, qn, nc + 1).astype(np.float32)
    reg = 1 / (1 + np.exp(-rng.randn(layers, b, qn, 4))).astype(np.float32)
    ann = np.full((b, 6, 5), -1.0, np.float32)
    ann[0, 0] = [0.3, 0.3, 0.2, 0.2, 2]
    ann[0, 1] = [0.6, 0.7, 0.3, 0.2, 4]
    ann[1, 0] = [0.5, 0.5, 0.4, 0.4, 1]

    lh = DETRLoss(num_classes=nc)((jnp.asarray(cls), jnp.asarray(reg)),
                                  jnp.asarray(ann))
    la = DETRLoss(num_classes=nc, matcher="auction")(
        (jnp.asarray(cls), jnp.asarray(reg)), jnp.asarray(ann))
    for k in lh:
        assert abs(float(lh[k]) - float(la[k])) < 1e-4, k
