"""OCR text-detection eval entrypoint (parity: reference
tools/test_text_detection_model.py + text_scripts.py:1421-1674 — DBNet
forward, contour decode, polygon precision/recall/F1 at IoU 0.5)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.data.text_detection import DBNetDecoder
from simpleaicv_tpu.evaluation.text_eval import evaluate_text_detection


def main():
    args = parse_work_dir()
    config = load_test_config(args)
    logger = get_logger("test")

    model = config.model
    s = config.input_image_size
    x0 = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, False))(
        jax.random.PRNGKey(0), x0)
    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": restore_trained_params(
            ckpt_path, variables["params"])}

    decoder = getattr(config, "decoder", None) or DBNetDecoder()
    forward = jax.jit(lambda v, x: model.apply(v, x, False))

    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    results = []
    for batch in loader:
        preds = np.asarray(forward(variables, jnp.asarray(batch["image"])))
        decoded = decoder(preds)
        for (boxes, _scores), gt_polys in zip(decoded, batch["polys"]):
            results.append({"pred_polys": list(boxes),
                            "gt_polys": list(gt_polys),
                            "gt_ignore": [False] * len(gt_polys)})
    stats = evaluate_text_detection(results)
    for k, v in stats.items():
        logger.info(f"{k}: {v}")


if __name__ == "__main__":
    main()
