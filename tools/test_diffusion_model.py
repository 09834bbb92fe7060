"""Diffusion eval entrypoint (parity: reference tools/test_diffusion_model.py
+ diffusion_scripts.py:19-178 — sample a grid of images with DDPM/DDIM, save
PNGs, compute FID/IS against the test dataset when inception weights are
configured)."""

import os

import numpy as np

from common import parse_work_dir, load_test_config, restore_trained_params

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.logging_utils import get_logger
from simpleaicv_tpu.tasks import diffusion


def main():
    args = parse_work_dir()
    config = load_test_config(args)
    logger = get_logger("test")

    model = config.model
    s = config.input_image_size
    n = getattr(config, "generate_num", 16)
    x0 = jnp.zeros((n, s, s, 3), jnp.float32)
    variables = jax.jit(lambda r, x, t: model.init(
        {"params": r}, x, t, None, False))(
        jax.random.PRNGKey(0), x0, jnp.zeros((n,), jnp.int32))
    ckpt_path = getattr(config, "trained_model_path", "")
    if ckpt_path:
        variables = {**variables, "params": restore_trained_params(
            ckpt_path, variables["params"])}

    generate = diffusion.make_generate_fn(model, config.sampler,
                                          (n, s, s, 3))
    images = np.asarray(generate(variables["params"],
                                 {k: v for k, v in variables.items()
                                  if k != "params"},
                                 jax.random.PRNGKey(getattr(config, "seed",
                                                            0))))
    images = np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)

    out_dir = os.path.join(args.work_dir, "generated")
    os.makedirs(out_dir, exist_ok=True)
    import cv2
    for i, img in enumerate(images):
        cv2.imwrite(os.path.join(out_dir, f"{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    logger.info(f"saved {len(images)} generated images to {out_dir}")

    inception_weights = getattr(config, "inception_weights_path", "")
    if inception_weights and getattr(config, "test_dataset", None) is not None:
        from simpleaicv_tpu.evaluation.fid_is import (
            compute_fid, compute_inception_score, make_inception_feature_fn)
        feat_fn = make_inception_feature_fn(inception_weights)
        # feature fn takes [0,1] (the reference wrapper's input contract,
        # metrics/inception.py:144-168); samples/dataset are in [-1,1]
        fake = images.astype(np.float32) / 255.0
        fake_feats, fake_probs = feat_fn(fake)
        reals = []
        for i in range(min(len(config.test_dataset), n)):
            sample = config.test_dataset[i]
            reals.append((np.asarray(sample["image"], np.float32) + 1.0) / 2)
        real_feats, _ = feat_fn(np.stack(reals))
        fid = compute_fid(real_feats, fake_feats)
        is_mean, is_std = compute_inception_score(fake_probs)
        logger.info(f"FID: {fid:.3f} IS: {is_mean:.3f}+-{is_std:.3f}")


if __name__ == "__main__":
    main()
