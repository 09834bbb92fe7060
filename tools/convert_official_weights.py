"""Convert an official torch checkpoint into an orbax checkpoint for our
models (parity: reference simpleAICV/classification/weight_convert/ scripts +
the *_test_convert_from_pytorch_official_weight verification ritual).

Usage:
  python tools/convert_official_weights.py \
      --family torchvision_resnet --network resnet50 \
      --checkpoint resnet50-official.pth --out converted/resnet50 \
      [--num-classes 1000] [--image-size 224]

Families: torchvision_resnet, mae_vit, convformer, inception_v3, sapiens_vit.
The converted checkpoint restores via ``trained_model_path`` in any
train_config or test_config.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.core.platform import apply_platform_env
apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True)
    p.add_argument("--network", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    import simpleaicv_tpu  # noqa: F401
    from simpleaicv_tpu.core.converters import (apply_converted,
                                                convert_torch_file)
    from simpleaicv_tpu.core.registry import BACKBONES, MODELS

    registry = BACKBONES if args.network in BACKBONES.names() else MODELS
    kwargs = {"num_classes": args.num_classes}
    if args.family in ("mae_vit", "dinov2_vit", "sapiens_vit"):
        kwargs["image_size"] = args.image_size
    model = registry.create(args.network, **kwargs)

    s = args.image_size
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, s, s, 3), jnp.float32), False))()

    converted = convert_torch_file(args.checkpoint, args.family)
    variables, n = apply_converted(dict(variables), converted)
    total = sum(len(jax.tree.leaves(variables.get(c, {})))
                for c in ("params", "batch_stats"))
    print(f"loaded {n}/{total} tensors from {args.checkpoint}")

    out = os.path.abspath(args.out)
    ocp.StandardCheckpointer().save(out, variables, force=True)
    print(f"saved converted checkpoint to {out}")


if __name__ == "__main__":
    main()
