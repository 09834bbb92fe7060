"""Model export (parity: reference tools/convert_torch2onnx.py /
convert_torch2jit.py). The TPU-native export path is jit -> StableHLO: the
serialized module runs under any XLA runtime (PJRT plugins, IREE, TF SavedModel
via jax2tf), replacing ONNX/TorchScript.

Usage: python tools/convert_to_stablehlo.py --work-dir <dir> \
           --output model.stablehlo [--batch 1]
The work dir's test_config.py supplies `config.model` and input size.
"""

import argparse

import common  # noqa: F401  (sets sys.path + platform)

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.config import load_config
from simpleaicv_tpu.core.logging_utils import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    config = load_config(args.work_dir, "test_config")
    logger = get_logger("export")

    model = config.model
    s = config.input_image_size
    x0 = jnp.zeros((args.batch, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, False))(
        jax.random.PRNGKey(0), x0)

    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": common.restore_trained_params(
            ckpt_path, variables["params"])}

    def forward(x):
        return model.apply(variables, x, False)

    lowered = jax.jit(forward).lower(x0)
    stablehlo = lowered.as_text(dialect="stablehlo")
    with open(args.output, "w") as f:
        f.write(stablehlo)
    logger.info(f"exported StableHLO ({len(stablehlo)} bytes) to "
                f"{args.output}")


if __name__ == "__main__":
    main()
