"""SAM interactive-segmentation eval entrypoint (parity: reference
tools/test_interactive_segmentation_model.py +
interactive_segmentation_scripts.py:87-194 — point-prompted best-mask IoU/
precision/recall over the val loader)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.tasks import interactive_segmentation as sam_task


def main():
    args = parse_work_dir()
    config = load_test_config(args)
    logger = get_logger("test")

    model = config.model
    s = config.input_image_size
    prompts = {
        "prompt_point": jnp.full((1, 9, 3), -1.0),
        "prompt_box": jnp.zeros((1, 4)),
        "prompt_mask": jnp.zeros((1, s // 4, s // 4, 1)),
    }
    x0 = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x, pr: model.init(
        {"params": r}, x, pr, (0, 1, 2, 3), False))(
        jax.random.PRNGKey(0), x0, prompts)
    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": restore_trained_params(
            ckpt_path, variables["params"])}

    predict = sam_task.make_predict_best_mask_fn(model)
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}

    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    meter = sam_task.SegmentationEvalMeter()
    for batch in loader:
        masks = predict(params, state_vars, jnp.asarray(batch["image"]),
                        jnp.asarray(batch["prompt_point"]))
        pred = (np.asarray(masks)[:, 0] > 0).astype(np.float32)
        gt = np.asarray(batch["mask"])
        if gt.shape[-2:] != pred.shape[-2:]:  # gt at input res, pred at /4
            f = gt.shape[-1] // pred.shape[-1]
            gt = gt[:, ::f, ::f]
        meter.update(pred, gt)
    for k, v in meter.compute().items():
        logger.info(f"{k}: {v}")


if __name__ == "__main__":
    main()
