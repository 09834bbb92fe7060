"""FID / Inception Score (parity: reference
simpleAICV/diffusion_model/metrics/inception.py:8-325 (InceptionV3 port) +
compute_fid_model_metric (calculate_frechet_distance:31,
compute_inception_score:90)).

The InceptionV3 feature extractor is a linen port of the torchvision
architecture; weights load through the generic torch converter
(core/weight_convert.py) from an `inception_v3` checkpoint when present —
FID numbers are only meaningful with those weights."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from scipy import linalg


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Parity: reference metrics/inception.py calculate_frechet_distance."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
                 2 * np.trace(covmean))


def compute_fid(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    mu1, sigma1 = real_features.mean(0), np.cov(real_features, rowvar=False)
    mu2, sigma2 = fake_features.mean(0), np.cov(fake_features, rowvar=False)
    return calculate_frechet_distance(mu1, sigma1, mu2, sigma2)


def compute_inception_score(probs: np.ndarray, splits: int = 10):
    """probs [N, 1000] softmax outputs -> (mean IS, std)."""
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        py = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-10) - np.log(py + 1e-10))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def make_inception_feature_fn(weights_path: Optional[str] = None,
                              fid_variant: bool = True,
                              resize_input: bool = True,
                              normalize_input: bool = True):
    """feature_fn(images [N,H,W,3] f32 in [0,1]) -> (pool [N,2048],
    probs [N,classes]) with the reference wrapper's exact contract
    (metrics/inception.py:117-170: bilinear half-pixel resize to 299 ->
    2x-1 normalize -> blocks -> pool3 / bias-less-fc softmax).
    fid_variant selects the FID-inception block semantics
    (models/inception_v3.py, reference fid_inception_v3) — the default,
    matching the reference's use_fid_inception=True; a torchvision or
    pt_inception FID state_dict loads through core/converters.py."""
    import jax
    import jax.numpy as jnp

    from ..models.inception_v3 import InceptionV3

    model = InceptionV3(fid=fid_variant)
    x0 = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    if weights_path:
        from ..core.converters import apply_converted, convert_torch_file
        variables, n = apply_converted(
            dict(variables), convert_torch_file(weights_path, "inception_v3"))
        n_expected = len(jax.tree.leaves(variables["params"])) + \
            len(jax.tree.leaves(variables.get("batch_stats", {})))
        if n < n_expected:
            raise ValueError(
                f"inception weight convert loaded {n}/{n_expected} tensors "
                f"from {weights_path}")

    @jax.jit
    def forward(images):
        if resize_input and images.shape[1:3] != (299, 299):
            # antialias=False makes jax bilinear resize match the
            # reference's F.interpolate(align_corners=False) half-pixel
            # sampling in BOTH directions: jax's default antialias=True
            # filters on downscale (inputs > 299px) where torch does not
            images = jax.image.resize(
                images, (images.shape[0], 299, 299, 3), "bilinear",
                antialias=False)
        if normalize_input:
            images = 2.0 * images - 1.0
        pool, logits = model.apply(variables, images, False)
        return pool, jax.nn.softmax(logits, -1)

    def feature_fn(images):
        pool, probs = forward(jnp.asarray(images, jnp.float32))
        return np.asarray(pool), np.asarray(probs)

    return feature_fn
