"""Numeric pinning tests for the evaluation stacks (VERDICT r2 #7).

FID / Inception Score (parity: reference
simpleAICV/diffusion_model/metrics/inception.py calculate_frechet_distance /
compute_inception_score): pinned to closed-form Gaussian identities and
hand-computed constants, not to our own code re-run.

COCO mAP (evaluation/coco_eval.py vs pycocotools COCOeval semantics):
pycocotools is not installed in this image, so the fixture is a designed
detections/GT set whose 101-point interpolated AP at every IoU threshold is
derived BY HAND below (externally to the implementation), pinning greedy
score-ordered matching, the 0.50:0.05:0.95 threshold sweep, and the 101-point
recall interpolation to known numbers.
"""

from __future__ import annotations

import numpy as np

from simpleaicv_tpu.evaluation.fid_is import (calculate_frechet_distance,
                                              compute_fid,
                                              compute_inception_score)
from simpleaicv_tpu.evaluation.coco_eval import evaluate_coco_detection_map


# ---------------------------------------------------------------- FID

def test_fid_identical_distribution_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    a = rng.randn(64, 8)
    sigma = np.cov(a, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_fid_identical_features_is_zero():
    rng = np.random.RandomState(1)
    feats = rng.randn(256, 16)
    assert abs(compute_fid(feats, feats.copy())) < 1e-6


def test_fid_analytic_diagonal_gaussian():
    """FID(N(m1, diag(a)), N(m2, diag(b)))
    = ||m1-m2||^2 + sum(a + b - 2*sqrt(a*b)) — closed form, exact moments."""
    rng = np.random.RandomState(2)
    d = 6
    m1, m2 = rng.randn(d), rng.randn(d)
    a = rng.rand(d) + 0.5
    b = rng.rand(d) + 0.5
    expect = float(((m1 - m2) ** 2).sum() +
                   (a + b - 2 * np.sqrt(a * b)).sum())
    got = calculate_frechet_distance(m1, np.diag(a), m2, np.diag(b))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_fid_mean_shift_only():
    """Equal covariances: FID reduces to the squared mean distance."""
    rng = np.random.RandomState(3)
    d = 5
    s = rng.randn(d, d)
    sigma = s @ s.T + np.eye(d)          # full (non-diagonal) SPD covariance
    m = rng.randn(d)
    shift = rng.randn(d)
    got = calculate_frechet_distance(m, sigma, m + shift, sigma)
    np.testing.assert_allclose(got, float((shift ** 2).sum()), atol=1e-6)


def test_fid_sample_estimate_matches_analytic():
    rng = np.random.RandomState(4)
    n, d = 200_000, 4
    a = np.array([1.0, 2.0, 0.5, 1.5])
    shift = np.array([1.0, 0.0, -1.0, 0.5])
    real = rng.randn(n, d)
    fake = rng.randn(n, d) * np.sqrt(a) + shift
    # analytic: ||shift||^2 + sum(1 + a - 2 sqrt(a))
    expect = float((shift ** 2).sum() + (1 + a - 2 * np.sqrt(a)).sum())
    got = compute_fid(real, fake)
    np.testing.assert_allclose(got, expect, atol=0.02)


# ---------------------------------------------------- Inception Score

def test_is_uniform_probs_is_one():
    probs = np.full((100, 10), 0.1)
    mean, std = compute_inception_score(probs, splits=10)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-6)
    assert std < 1e-8


def test_is_balanced_onehot_equals_num_classes():
    """Perfectly confident + perfectly diverse: IS == number of classes.
    Each split of 10 contains each of the 5 classes twice, so p(y) is
    uniform, KL = log(5) per sample, IS = exp(log 5) = 5."""
    c, n = 5, 50
    probs = np.eye(c)[np.arange(n) % c]
    mean, std = compute_inception_score(probs, splits=5)
    np.testing.assert_allclose(mean, float(c), rtol=1e-4)
    assert std < 1e-6


def test_is_hand_computed_two_class():
    """probs [[.9,.1],[.1,.9]], one split: p(y)=[.5,.5];
    KL = .9 ln(.9/.5) + .1 ln(.1/.5) = 0.368117... for both samples;
    IS = exp(0.368117) = 1.445011 (hand-derived constant)."""
    probs = np.array([[0.9, 0.1], [0.1, 0.9]])
    mean, _ = compute_inception_score(probs, splits=1)
    np.testing.assert_allclose(mean, 1.4450109, rtol=1e-4)


# ------------------------------------------------------------ COCO mAP

def test_coco_map_hand_pinned_fixture():
    """One image, one category, 2 GT, 2 detections with exact IoUs 0.6 / 0.8.

    GT1=[0,0,10,10]; det1=[0,0,10,6]  -> inter 60, union 100, IoU .6, score .9
    GT2=[20,20,30,30]; det2=[20,20,30,28] -> inter 80, union 100, IoU .8, score .8

    Hand derivation per IoU threshold (greedy, score-descending):
      t in {.50,.55,.60}: both TP -> P/R curve hits precision 1 at recall 1
                          -> AP = 1.0
      t in {.65,.70,.75,.80}: det1 FP, det2 TP -> one TP at rank 2
                          (precision 1/2, recall 1/2); 101-pt AP =
                          51 * 0.5 / 101 = 0.2524752...
      t in {.85,.90,.95}: no TP -> AP = 0
    mAP = (3*1 + 4*0.2524752 + 3*0)/10 = 0.400990099
    AP50 = 1.0, AP75 = 0.2524752
    mAR@100 = (3*1.0 + 4*0.5 + 3*0)/10 = 0.5  (recall = TP/2 GT)
    Both GT areas are 100 (small): area=small stats equal area=all;
    medium/large have no GT -> -1.
    """
    res = [{
        "det_boxes": np.array([[0, 0, 10, 6], [20, 20, 30, 28]], np.float32),
        "det_scores": np.array([0.9, 0.8], np.float32),
        "det_classes": np.array([0, 0], np.float32),
        "gt_boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32),
        "gt_classes": np.array([0, 0], np.float32),
    }]
    stats = evaluate_coco_detection_map(res, num_classes=1)
    ap75 = 51 * 0.5 / 101
    np.testing.assert_allclose(
        stats["IoU=0.5,area=all,maxDets=100,mAP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        stats["IoU=0.75,area=all,maxDets=100,mAP"], ap75, atol=1e-6)
    np.testing.assert_allclose(
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"],
        (3 * 1.0 + 4 * ap75) / 10, atol=1e-6)
    np.testing.assert_allclose(
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAR"], 0.5, atol=1e-6)
    np.testing.assert_allclose(
        stats["IoU=0.5:0.95,area=small,maxDets=100,mAP"],
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"], atol=1e-6)
    assert stats["IoU=0.5:0.95,area=medium,maxDets=100,mAP"] == -1.0
    assert stats["IoU=0.5:0.95,area=large,maxDets=100,mAP"] == -1.0


def test_coco_map_crowding_and_score_order():
    """Second hand-derived fixture: a high-scoring FP ahead of a TP.

    1 GT=[0,0,10,10]; det A score .95 IoU 0 (far away), det B score .9
    IoU 1.0 (exact). At every threshold: rank1 FP, rank2 TP ->
    precisions (0, 1/2), recall reaches 1.0 at precision 0.5.
    101-pt AP = 0.5 (envelope = .5 across all 101 recall points).
    """
    res = [{
        "det_boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32),
        "det_scores": np.array([0.95, 0.9], np.float32),
        "det_classes": np.array([0, 0], np.float32),
        "gt_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "gt_classes": np.array([0, 0], np.float32)[:1],
    }]
    stats = evaluate_coco_detection_map(res, num_classes=1)
    np.testing.assert_allclose(
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAP"], 0.5, atol=1e-6)
    np.testing.assert_allclose(
        stats["IoU=0.5:0.95,area=all,maxDets=100,mAR"], 1.0, atol=1e-6)
