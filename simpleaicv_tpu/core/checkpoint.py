"""Checkpointing: Orbax with the reference's latest/best/named-final semantics.

Parity (reference tools/train_classification_model.py:141-160,209-272 and
SURVEY.md §5):
  * ``latest`` = full training state (params, opt_state, ema, step, epoch,
    best metric) written every epoch, auto-resumed on restart;
  * ``best`` = bare params (EMA params when enabled), renamed at the end to
    ``{network}-metric{value}`` — here saved under a ``best`` key with the
    metric stored alongside;
  * partial/shape-filtered loading with bicubic pos-embed interpolation
    (reference simpleAICV/classification/common.py:758-840).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )
        self._best_dir = os.path.join(self.directory, "best")
        self._best_ckpt = None  # lazy async StandardCheckpointer

    # -- latest (full train state) ------------------------------------------
    def save_latest(self, epoch: int, state, extra: Optional[dict] = None):
        """Async save: orbax copies device->host before returning, then
        writes to disk in the background, so the next epoch's compute
        overlaps the write. The PREVIOUS in-flight save is drained first
        (serialised writes); call :meth:`wait` before exiting/restoring."""
        self._mgr.wait_until_finished()
        payload = {"state": state, "extra": extra or {}}
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))

    def wait(self):
        """Drain any in-flight async saves (latest + best)."""
        self._mgr.wait_until_finished()
        if self._best_ckpt is not None:
            self._best_ckpt.wait_until_finished()

    def restore_latest(self, abstract_state, extra_template: Optional[dict] = None):
        """Returns (epoch, state, extra) or None if no checkpoint exists."""
        self.wait()
        step = self._mgr.latest_step()
        if step is None:
            return None
        payload = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                {"state": abstract_state, "extra": extra_template or {}}))
        return step, payload["state"], payload["extra"]

    # -- best (bare params) -------------------------------------------------
    def save_best(self, params, metric: float):
        if self._best_ckpt is None:
            self._best_ckpt = ocp.StandardCheckpointer()
        # drain the previous async best-save before rmtree'ing its target
        self._best_ckpt.wait_until_finished()
        path = os.path.join(self._best_dir)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._best_ckpt.save(path, {"params": params,
                                    "metric": jnp.asarray(metric,
                                                          jnp.float32)})

    def restore_best(self, abstract_params):
        self.wait()
        ckpt = ocp.StandardCheckpointer()
        payload = ckpt.restore(
            self._best_dir, {"params": abstract_params,
                             "metric": jnp.zeros((), jnp.float32)})
        return payload["params"], float(payload["metric"])

    def finalize_best(self, network: str, metric: float):
        """Reference renames best.pth -> '{network}-acc{best:.3f}.pth'
        (train_classification_model.py:267-272); we symlink a named dir."""
        named = os.path.join(self.directory, f"{network}-metric{metric:.3f}")
        if os.path.islink(named):
            os.unlink(named)
        if os.path.exists(self._best_dir) and not os.path.exists(named):
            os.symlink(self._best_dir, named)


def load_state_dict_partial(saved_params, model_params,
                            pos_embed_names=("position_encoding",)):
    """Name+shape-filtered partial load with pos-embed bicubic resize.

    Parity: reference ``load_state_dict``
    (simpleAICV/classification/common.py:758-840): keep only keys present in
    the target with identical shapes; 3-D "position_encoding"-like tensors with
    a token-count mismatch are bicubically resized (cls token preserved).
    """
    flat_saved = _flatten(saved_params)
    flat_model = _flatten(model_params)

    out = dict(flat_model)
    n_loaded = 0
    for k, v in flat_saved.items():
        if k not in flat_model:
            continue
        tgt = flat_model[k]
        if v.shape == tgt.shape:
            out[k] = jnp.asarray(v, tgt.dtype)
            n_loaded += 1
        elif (any(name in k for name in pos_embed_names) and v.ndim == 3
              and tgt.ndim == 3 and v.shape[-1] == tgt.shape[-1]):
            out[k] = _resize_pos_embed(np.asarray(v), tgt.shape).astype(
                np.asarray(tgt).dtype)
            n_loaded += 1
    return _unflatten(out), n_loaded


def _resize_pos_embed(pos, target_shape):
    """[1, 1+N, C] -> [1, 1+M, C] bicubic grid resize (cls token kept)."""
    n_src = pos.shape[1] - 1
    n_tgt = target_shape[1] - 1
    side_src = int(round(n_src**0.5))
    side_tgt = int(round(n_tgt**0.5))
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(side_src, side_src, -1)
    import cv2
    grid = cv2.resize(grid.astype(np.float32), (side_tgt, side_tgt),
                      interpolation=cv2.INTER_CUBIC)
    grid = grid.reshape(1, side_tgt * side_tgt, -1)
    return np.concatenate([cls_tok, grid], axis=1)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
