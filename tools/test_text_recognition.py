"""OCR recognition eval entrypoint (parity: reference
tools/test_text_recognition_model.py — string accuracy + LCS P/R)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.tasks import text_recognition as tr


def main():
    args = parse_work_dir()
    config = load_test_config(args)
    logger = get_logger("test")

    model = config.model
    batch0 = config.test_collater([config.test_dataset[0]])
    x0 = jnp.asarray(batch0["image"])
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
    stats = tr.evaluate_text_recognition(model, variables["params"],
                                         state_vars, loader,
                                         config.converter)
    for k, v in stats.items():
        logger.info(f"{k}: {v}")


if __name__ == "__main__":
    main()
