"""SAM-matting eval entrypoint (parity: reference
tools/test_interactive_matting_model.py + interactive_matting_scripts.py:18
— SAD/MAE/MSE on the fused alpha, point-prompted)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.data.loader import DataLoader


def main():
    args = parse_work_dir()
    config = load_test_config(args)
    logger = get_logger("test")

    model = config.model
    s = config.input_image_size
    prompts = {"prompt_point": jnp.full((1, 9, 3), -1.0),
               "prompt_box": jnp.zeros((1, 4)), "prompt_mask": None}
    x0 = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x, pr: model.init(
        {"params": r}, x, pr, False))(jax.random.PRNGKey(0), x0, prompts)
    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": restore_trained_params(
            ckpt_path, variables["params"])}

    @jax.jit
    def forward(v, x, points):
        pr = {"prompt_point": points, "prompt_box": None, "prompt_mask": None}
        _, _, fused, _ = model.apply(v, x, pr, False)
        return fused

    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    sad = mae = mse = n = 0.0
    for batch in loader:
        fused = np.asarray(forward(variables, jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["prompt_point"])))
        pred = fused[..., 0]
        alpha = np.asarray(batch["alpha"])
        if alpha.shape[-2:] != pred.shape[-2:]:
            f = alpha.shape[-1] // pred.shape[-1]
            alpha = alpha[:, ::f, ::f]
        diff = pred - alpha
        sad += float(np.abs(diff).sum()) / 1000.0
        mae += float(np.abs(diff).mean(axis=(1, 2)).sum())
        mse += float((diff**2).mean(axis=(1, 2)).sum())
        n += pred.shape[0]
    n = max(n, 1.0)
    for k, v in {"sad": sad / n, "mae": mae / n, "mse": mse / n}.items():
        logger.info(f"{k}: {v}")


if __name__ == "__main__":
    main()
