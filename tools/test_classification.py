"""Classification eval entrypoint (parity: reference
tools/test_classification_model.py:30-98 — restores best/specified weights,
reports MACs/params then top-1/top-5)."""

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.checkpoint import CheckpointManager
from simpleaicv_tpu.core.engine import make_eval_step
from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.core.profile import compute_macs_and_params, \
    format_macs_params
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.parallel.mesh import (MeshConfig, batch_sharding,
                                          make_mesh, replicated)
from simpleaicv_tpu.tasks import classification


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

    macs, params = compute_macs_and_params(
        lambda v, x: model.apply(v, x, False), variables, x0)
    logger.info(format_macs_params(macs, params))

    mesh = make_mesh(MeshConfig())
    # params were initialized committed to one device; the sharded
    # eval batches need them replicated over the mesh
    variables = jax.device_put(variables, replicated(mesh))
    bsh = batch_sharding(mesh)
    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    eval_step = make_eval_step(classification.make_eval_fn(model))
    state_vars = {k: v for k, v in variables.items() if k != "params"}

    import numpy as np

    def shard(batch):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                bsh, np.asarray(x)), batch)

    metrics = classification.evaluate(eval_step, variables["params"],
                                      state_vars, loader, shard)
    logger.info(f"top1: {metrics['acc1']:.3f}% top5: {metrics['acc5']:.3f}%")


if __name__ == "__main__":
    main()
