"""Text-recognition task adapter (parity: reference
tools/text_scripts.py:72-884 — CTC training, greedy-decode eval with string
accuracy + char-level LCS precision/recall)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_loss_fn(model, criterion) -> Callable:

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        if train and mutable:
            preds, new_vars = model.apply(variables, batch["image"], train,
                                          rngs=rngs, mutable=mutable)
        else:
            preds = model.apply(variables, batch["image"], train, rngs=rngs)
            new_vars = state_vars
        loss = criterion(preds, batch["targets"], batch["target_lengths"])
        return loss, ({}, new_vars)

    return loss_fn


def lcs_length(a: str, b: str) -> int:
    """Longest common subsequence (reference text_scripts.py:739)."""
    if not a or not b:
        return 0
    dp = np.zeros((len(a) + 1, len(b) + 1), np.int32)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                dp[i, j] = dp[i - 1, j - 1] + 1
            else:
                dp[i, j] = max(dp[i - 1, j], dp[i, j - 1])
    return int(dp[len(a), len(b)])


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (replaces the reference's nltk edit_distance,
    text_scripts.py:9)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1, dtype=np.int32)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, np.int32)
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return int(prev[-1])


def normalized_edit_similarity(pred: str, gt: str) -> float:
    """ICDAR2019 1-NED term per sample (reference text_scripts.py:233-244:
    1 - ED/max_len, 0 when either string empty)."""
    if len(pred) == 0 or len(gt) == 0:
        return 0.0
    return 1.0 - edit_distance(pred, gt) / max(len(gt), len(pred))


def evaluate_text_recognition(model, params, state_vars, loader,
                              converter) -> dict:
    """String accuracy + LCS char precision/recall + mean 1-NED
    (reference text_scripts.py:72-248 semantics: whitespace stripped,
    case-insensitive)."""

    @jax.jit
    def forward(p, sv, images):
        return model.apply({"params": p, **sv}, images, False)

    n_correct = 0
    n_total = 0
    lcs_sum = pred_chars = gt_chars = 0
    ne_sum = 0.0
    for batch in loader:
        preds = forward(params, state_vars, jnp.asarray(batch["image"]))
        idxs = np.asarray(jnp.argmax(preds, axis=-1))
        pred_texts = converter.decode(idxs)
        for pred, gt in zip(pred_texts, batch["texts"]):
            pred_n = pred.replace(" ", "").lower()
            gt_n = gt.replace(" ", "").lower()
            if not gt_n:
                continue
            n_total += 1
            n_correct += int(pred_n == gt_n)
            ne_sum += normalized_edit_similarity(pred_n, gt_n)
            lcs = lcs_length(pred, gt)
            lcs_sum += lcs
            pred_chars += len(pred)
            gt_chars += len(gt)
    acc = n_correct / max(n_total, 1) * 100
    precision = lcs_sum / max(pred_chars, 1) * 100
    recall = lcs_sum / max(gt_chars, 1) * 100
    return {"str_acc": acc, "lcs_precision": precision, "lcs_recall": recall,
            "edit_distance_1ned": ne_sum / max(n_total, 1) * 100,
            "key_metric": acc}
