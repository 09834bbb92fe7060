"""SAM: component shapes, full forward with each prompt modality, loss
finiteness, one train step improves loss on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.interactive_segmentation import (
    FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)
from simpleaicv_tpu.tasks.interactive_segmentation import (
    make_loss_fn, sample_error_region_points)

IMG = 64  # tiny SAM: 64 image, patch 16 -> 4x4 grid


@pytest.fixture(scope="module")
def tiny_sam():
    model = MODELS.create(
        "sam_b", image_size=IMG,
        image_encoder_embedding_planes=64, image_encoder_block_nums=2,
        image_encoder_head_nums=2, image_encoder_window_size=2,
        image_encoder_global_attn_indexes=(1,),
        prompt_encoder_embedding_planes=64)
    batch = _make_batch()
    # init with ALL prompt modalities so every branch's params exist
    prompts = {"prompt_point": jnp.asarray(batch["prompt_point"]),
               "prompt_box": jnp.asarray(batch["prompt_box"]),
               "prompt_mask": jnp.asarray(batch["prompt_mask"])}
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["image"]), prompts,
                           (0, 1, 2, 3), False)
    return model, variables, batch


def _make_batch():
    ds = FakeSAMSegmentationDataset(4, IMG, transform=SamResize(IMG))
    collater = SAMBatchCollater(resize=IMG)
    return collater([ds[i] for i in range(2)])


def test_sam_forward_points(tiny_sam):
    model, variables, batch = tiny_sam
    prompts = {"prompt_point": jnp.asarray(batch["prompt_point"]),
               "prompt_box": None, "prompt_mask": None}
    masks, ious = model.apply(variables, jnp.asarray(batch["image"]), prompts,
                              (0, 1, 2, 3), False)
    assert masks.shape == (2, 4, IMG, IMG)
    assert ious.shape == (2, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_sam_forward_box_and_mask(tiny_sam):
    model, variables, batch = tiny_sam
    prompts = {"prompt_point": None,
               "prompt_box": jnp.asarray(batch["prompt_box"]),
               "prompt_mask": jnp.asarray(batch["prompt_mask"])}
    masks, ious = model.apply(variables, jnp.asarray(batch["image"]), prompts,
                              (0,), False)
    assert masks.shape == (2, 1, IMG, IMG)


def test_sam_loss_and_gradstep(tiny_sam):
    model, variables, batch = tiny_sam
    criterion = LOSSES.create("SAMMultiLevelLoss")
    loss_fn = make_loss_fn(model, criterion)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    jbatch["prompt_box"] = None
    jbatch["prompt_mask"] = None

    params = variables["params"]
    (loss, (metrics, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, {}, jbatch, jax.random.PRNGKey(0),
                               True)
    assert np.isfinite(float(loss))
    for k in ("focal_loss", "dice_loss", "iou_predict_loss"):
        assert np.isfinite(float(metrics[k]))
    gnorm = jax.flatten_util.ravel_pytree(grads)[0]
    assert np.isfinite(np.asarray(gnorm)).all()
    # frozen image encoder -> zero grads there when flag set
    model_f = MODELS.create(
        "sam_b", image_size=IMG, image_encoder_embedding_planes=64,
        image_encoder_block_nums=2, image_encoder_head_nums=2,
        image_encoder_window_size=2, image_encoder_global_attn_indexes=(1,),
        prompt_encoder_embedding_planes=64, frozen_image_encoder=True)
    loss_fn_f = make_loss_fn(model_f, criterion)
    grads_f = jax.grad(lambda p: loss_fn_f(p, {}, jbatch,
                                           jax.random.PRNGKey(0), True)[0])(
        params)
    enc_g = jax.flatten_util.ravel_pytree(grads_f["image_encoder"])[0]
    assert float(jnp.max(jnp.abs(enc_g))) == 0.0


def test_error_region_point_sampling():
    pred = jnp.zeros((2, 1, 8, 8))  # logits 0 -> predicted bg everywhere
    gt = jnp.zeros((2, 8, 8)).at[:, 4, 5].set(1.0)
    prev = jnp.full((2, 3, 3), -1.0)
    prev = prev.at[:, 0].set(jnp.asarray([1.0, 1.0, 1.0]))  # slot 0 taken
    # single-pixel error region: below the reference's abort threshold
    # unless disabled (interactive_segmentation_scripts.py:447-452)
    pts = sample_error_region_points(pred, gt, prev, min_error_pixels=0)
    assert pts.shape == (2, 3, 3)  # fixed shape: slot insertion, no concat
    np.testing.assert_allclose(np.asarray(pts[:, 1]),
                               [[5, 4, 1], [5, 4, 1]])  # first free slot
    np.testing.assert_allclose(np.asarray(pts[:, 0]), 1.0)  # untouched
    # full prompt: overwrite last slot
    full = jnp.ones((2, 3, 3))
    pts2 = sample_error_region_points(pred, gt, full, min_error_pixels=0)
    np.testing.assert_allclose(np.asarray(pts2[:, 2]),
                               [[5, 4, 1], [5, 4, 1]])
    # default threshold: the 1-pixel region aborts, points unchanged
    pts3 = sample_error_region_points(pred, gt, prev)
    np.testing.assert_allclose(np.asarray(pts3), np.asarray(prev))


def test_sam_distill_loss_matches_torch_restatement():
    """SAMDistillLoss vs a literal torch restatement of the reference's
    per-slot focal / global dice / iou-MSE (distill_losses.py:27-170)."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import numpy as np
    import jax.numpy as jnp
    from simpleaicv_tpu.losses import SAMDistillLoss

    rng = np.random.RandomState(0)
    b, n, h, w = 2, 4, 16, 16
    tea_masks = rng.randn(b, n, h, w).astype(np.float32)
    stu_masks = rng.randn(b, n, h, w).astype(np.float32)
    tea_ious = rng.rand(b, n).astype(np.float32)
    stu_ious = rng.rand(b, n).astype(np.float32)

    ours = SAMDistillLoss()((jnp.asarray(tea_masks), jnp.asarray(tea_ious)),
                            (jnp.asarray(stu_masks), jnp.asarray(stu_ious)))

    alpha, gamma, smooth = 0.8, 2.0, 1e-4
    tm = (torch.tensor(tea_masks) > 0).float()
    sm = torch.tensor(stu_masks)
    focal_total = 0.0
    dice_total = 0.0
    for i in range(n):
        s_i = sm[:, i].reshape(-1)
        t_i = tm[:, i].reshape(-1)
        bce = F.binary_cross_entropy_with_logits(s_i, t_i, reduction="none")
        focal_total += (alpha * (1 - torch.exp(-bce))**gamma * bce
                        ).mean().item()
        p_i = torch.sigmoid(s_i)
        inter = (p_i * t_i).sum()
        dice_total += (1 - (2 * inter + smooth) /
                       (p_i.sum() + t_i.sum() + smooth)).item()
    iou_total = sum(
        F.mse_loss(torch.tensor(stu_ious[:, i]), torch.tensor(tea_ious[:, i]),
                   reduction="sum").item() for i in range(n))

    assert abs(float(ours["distill_focal_loss"]) - 20 * focal_total / b) < 1e-3
    assert abs(float(ours["distill_dice_loss"]) - dice_total / b) < 1e-4
    assert abs(float(ours["distill_iou_predict_loss"]) - iou_total / b) < 1e-4


def test_sample_error_region_points_uniform_and_abort():
    """Gumbel-max uniform error sampling matches the reference non-SLIC
    branch semantics (interactive_segmentation_scripts.py:447-460): uniform
    over fp|fn, fn -> positive click, fp -> negative click, tiny error
    regions abort."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simpleaicv_tpu.tasks.interactive_segmentation import \
        sample_error_region_points

    h = w = 16
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 4:12, 4:12] = 1.0                       # fg square
    pred = np.full((1, 1, h, w), -1.0, np.float32)  # predicts all bg
    pred[0, 0, 4:12, 4:8] = 1.0                   # left half correct
    # error region = fn pixels at [4:12, 8:12] (32 px)
    prev = np.full((1, 9, 3), -1.0, np.float32)

    hits = set()
    for i in range(64):
        out = sample_error_region_points(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(prev),
            rng=jax.random.PRNGKey(i))
        x, y, lbl = np.asarray(out)[0, 0]
        assert 8 <= x < 12 and 4 <= y < 12, (x, y)
        assert lbl == 1.0                         # fn -> positive click
        hits.add((int(x), int(y)))
    assert len(hits) > 10                         # actually spreads out

    # fp pixels -> negative click
    pred2 = np.full((1, 1, h, w), 1.0, np.float32)  # predicts all fg
    out = sample_error_region_points(jnp.asarray(pred2), jnp.asarray(gt),
                                     jnp.asarray(prev),
                                     rng=jax.random.PRNGKey(0))
    x, y, lbl = np.asarray(out)[0, 0]
    assert lbl == 0.0

    # tiny error region aborts (keeps previous points)
    pred3 = np.where(gt[:, None] > 0, 1.0, -1.0).astype(np.float32)
    pred3[0, 0, 4, 4] = -1.0                      # exactly 1 error pixel
    out = sample_error_region_points(jnp.asarray(pred3), jnp.asarray(gt),
                                     jnp.asarray(prev),
                                     rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), prev)
