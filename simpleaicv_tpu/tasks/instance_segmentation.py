"""Instance-segmentation task adapter: COCO 'segm' (mask) mAP evaluation
(parity: reference tools/scripts.py:1428-1548
evaluate_coco_instance_segmentation — detections RLE-encoded and scored with
COCOeval iouType='segm'; here mask IoU is computed directly on binary masks
at the collater's mask resolution instead of full-image RLE)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.coco_eval import CocoMAPEvaluator


def evaluate_coco_segm(model, params, state_vars, decoder, loader,
                       num_classes: int) -> dict:
    """Forward (jit) -> on-device decode -> host mask mAP.

    The decoder returns (masks [B,K,H,W] bool, labels [B,K], scores [B,K])
    with −1 padding (SOLOV2Decoder contract); ground-truth masks come from
    the collater at mask_downsample resolution, so decoded masks are pooled
    down to that grid for the IoU."""

    @jax.jit
    def forward(p, sv, images):
        return model.apply({"params": p, **sv}, images, False)

    evaluator = CocoMAPEvaluator(num_classes, iou_type="segm")
    for batch in loader:
        outs = forward(params, state_vars, jnp.asarray(batch["image"]))
        det_masks, det_labels, det_scores = decoder(outs)
        det_masks = np.asarray(det_masks)
        det_labels = np.asarray(det_labels)
        det_scores = np.asarray(det_scores)
        gt_masks = np.asarray(batch["gt_masks"])        # [B,M,mr,mr]
        annots = np.asarray(batch["annots"])            # [B,M,5]
        scales = np.asarray(batch.get(
            "scale", np.ones(det_scores.shape[0], np.float32)))
        mr = gt_masks.shape[-1]
        b, k = det_scores.shape
        down = det_masks.shape[-1] / mr if det_masks.size else 4.0
        for i in range(b):
            keep = det_scores[i] > 0
            dm = det_masks[i][keep].astype(np.float32)
            if dm.shape[0] > 0 and dm.shape[-1] != mr:
                # average-pool the decoded masks down to the gt grid
                f = dm.shape[-1] // mr
                dm = dm[:, :f * mr, :f * mr].reshape(
                    dm.shape[0], mr, f, mr, f).mean(axis=(2, 4))
            dm = dm > 0.5
            gt_valid = annots[i, :, 4] >= 0
            evaluator.add_image(
                det_scores=det_scores[i][keep],
                det_classes=det_labels[i][keep].astype(np.int32),
                gt_classes=annots[i, gt_valid, 4].astype(np.int32),
                det_masks=dm.reshape((-1, mr, mr)),
                gt_masks=gt_masks[i][gt_valid],
                area_scale=float(down / max(scales[i], 1e-8))**2)
    stats = evaluator.compute()
    key = stats.get("IoU=0.5:0.95,area=all,maxDets=100,mAP", -1.0)
    stats["key_metric"] = key * 100.0
    return stats
