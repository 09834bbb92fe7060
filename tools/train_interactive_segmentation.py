"""SAM interactive-segmentation training entrypoint (parity: reference
tools/train_interactive_segmentation_model.py + the train_sam_segmentation
loop at tools/interactive_segmentation_scripts.py:821-1064: per-batch random
prompt modality, ``decoder_point_iters`` refinement iterations with an
optimizer step each, refreshed error-region points between iterations)."""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import interactive_segmentation as sam_task


class SAMTrainer(Trainer):

    def __init__(self, config, work_dir):
        s = config.input_image_size
        low = s // 4
        init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}
        self.prompt_probs = getattr(config, "prompt_probs",
                                    {"point": 0.5, "box": 0.25, "mask": 0.25})
        self.decoder_point_iters = getattr(config, "decoder_point_iters", 1)
        super().__init__(config, work_dir,
                         make_loss_fn=lambda model, criterion:
                         sam_task.make_loss_fn(model, criterion),
                         evaluate=self._evaluate,
                         init_batch=init_batch)
        self._predict = sam_task.make_predict_best_mask_fn(self.model)

        @jax.jit
        def _sample_points(masks, gt, pts, rng, step):
            return sam_task.sample_error_region_points(
                masks, gt, pts, rng=jax.random.fold_in(rng, step))

        self._sample_points = _sample_points

        @jax.jit
        def _iou_stats(pred, mask):
            """Summed best-mask IoU + count, reduced ON DEVICE so eval works
            with mesh-sharded global batches in multi-process runs (a host
            np.asarray of a non-addressable global array would crash)."""
            pred_bin = (pred[:, 0] > 0.0).astype(jnp.float32)
            gt = mask.astype(jnp.float32)
            if gt.ndim == 4:
                gt = gt[:, 0] if gt.shape[1] == 1 else gt[..., 0]
            inter = jnp.sum(pred_bin * gt, axis=(1, 2))
            union = (jnp.sum(pred_bin, axis=(1, 2)) + jnp.sum(gt, axis=(1, 2))
                     - inter)
            return (jnp.sum(inter / jnp.maximum(union, 1.0)),
                    jnp.float32(pred_bin.shape[0]))

        self._iou_stats = _iou_stats

    def _evaluate(self, eval_step, params, state_vars, loader, shard_fn):
        """Per-epoch point-prompt validation across EVERY configured test
        dataset (reference tools/interactive_segmentation_scripts.py:87-105
        loops `test_loader_list`, reporting per-dataset IoU); the best
        checkpoint is selected on the sample-weighted combined mean IoU."""
        del eval_step, loader
        metrics = {}
        tot_sum = tot_n = 0.0
        for name, dl in self.test_loaders.items():
            iou_sum = n = 0.0
            for batch in dl:
                g = shard_fn(batch)
                pred = self._predict(params, state_vars, g["image"],
                                     g["prompt_point"])   # [B,1,H,W] logits
                s, c = self._iou_stats(pred, g["mask"])   # replicated scalars
                iou_sum += float(s)
                n += float(c)
            metrics[f"iou/{name}"] = iou_sum / max(n, 1.0)
            tot_sum += iou_sum
            tot_n += n
        miou = tot_sum / max(tot_n, 1.0)
        metrics.update({"iou": miou, "key_metric": miou})
        return metrics

    def _init_variables(self, model, rng, init_batch):
        s = self.config.input_image_size
        prompts = {
            "prompt_point": jnp.full((2, 9, 3), -1.0),
            "prompt_box": jnp.zeros((2, 4)),
            "prompt_mask": jnp.zeros((2, s // 4, s // 4, 1)),
        }
        @jax.jit
        def _init(r, image, pr):
            return model.init({"params": r, "dropout": r}, image, pr,
                              (0, 1, 2, 3), True)
        return _init(rng, init_batch["image"], prompts)

    def train_epoch(self, epoch):
        self.train_loader.set_epoch(epoch)
        import time
        from simpleaicv_tpu.core.meters import AverageMeter
        loss_meter = AverageMeter()
        for i, batch in enumerate(self.train_loader, start=1):
            # choose one prompt modality per batch (reference :867-921)
            r = random.random()
            if r < self.prompt_probs["point"]:
                keep = {"prompt_point"}
            elif r < self.prompt_probs["point"] + self.prompt_probs["box"]:
                keep = {"prompt_box"}
            else:
                keep = {"prompt_mask"}
            use_batch = dict(batch)
            for k in ("prompt_point", "prompt_box", "prompt_mask"):
                if k not in keep:
                    use_batch[k] = None

            gbatch = {k: (self.shard({"x": v})["x"] if v is not None
                          else None) for k, v in use_batch.items()}
            refine = ("prompt_point" in keep)
            iters = self.decoder_point_iters if refine else 1
            for it in range(iters):
                # constant base rng: the jitted step folds state.step in
                # on-device (engine.py) — no eager per-iter RNG dispatch
                self.state, metrics = self.train_step(self.state, gbatch,
                                                      self.rng)
                if it + 1 < iters:
                    # resample a click at a random error pixel (jit,
                    # fixed-shape slot insertion; rng folded on-device
                    # from the base rng + step counter)
                    masks = self._predict(self.state.params,
                                          self.state.state_vars,
                                          gbatch["image"],
                                          gbatch["prompt_point"])
                    gbatch["prompt_point"] = self._sample_points(
                        masks, gbatch["mask"], gbatch["prompt_point"],
                        self.rng, self.state.step)
            if i % self.print_interval == 0:
                loss_meter.update(float(metrics["loss"]))
                self.log(f"epoch {epoch} iter {i}/{self.steps_per_epoch} "
                         f"loss {float(metrics['loss']):.4f}")
        return loss_meter.avg if loss_meter.count else float(metrics["loss"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    config = load_config(args.work_dir)
    SAMTrainer(config, args.work_dir).run()


if __name__ == "__main__":
    main()
