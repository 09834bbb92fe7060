"""Face-detection eval entrypoint (parity: reference
tools/test_face_detection_model.py — single-class COCO-style AP over the
RetinaFace decoder; the reference's widerface easy/medium/hard split lives in
evaluation.text_eval.evaluate_widerface_style when per-subset results are
available)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.tasks import detection


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

    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    stats = detection.evaluate_coco(model, variables["params"], state_vars,
                                    config.decoder, loader, 1)
    for k, v in stats.items():
        logger.info(f"{k}: {v}")


if __name__ == "__main__":
    main()
