"""ImageNet-21K semantic-softmax eval entrypoint (parity: reference
tools/test_imagenet21k_classification_model.py — per-hierarchy-level
accuracy via the semantic tree)."""

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

    ds = config.test_dataset
    ds._load_tree()
    hierarchy_idx = [jnp.asarray(i) for i in ds.hierarchy_indices_list]

    model = config.model
    s = config.input_image_size
    x0 = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, False))(
        jax.random.PRNGKey(0), x0)
    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": restore_trained_params(
            ckpt_path, variables["params"])}

    @jax.jit
    def forward(v, x):
        return model.apply(v, x, False)

    loader = DataLoader(ds, config.batch_size, config.test_collater,
                        shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 4))
    correct = np.zeros(len(hierarchy_idx))
    total = np.zeros(len(hierarchy_idx))
    for batch in loader:
        out = forward(variables, jnp.asarray(batch["image"]))
        labels = np.asarray(batch["semantic_label"])
        for level, idx in enumerate(hierarchy_idx):
            pred = np.asarray(jnp.argmax(out[:, idx], -1))
            lab = labels[:, level]
            valid = lab >= 0
            correct[level] += (pred[valid] == lab[valid]).sum()
            total[level] += valid.sum()
    for level in range(len(hierarchy_idx)):
        acc = correct[level] / max(total[level], 1) * 100
        logger.info(f"level {level} semantic acc: {acc:.3f}")
    logger.info(f"overall semantic acc: "
                f"{correct.sum() / max(total.sum(), 1) * 100:.3f}")


if __name__ == "__main__":
    main()
