"""OCR (CTC + DBNet), PFAN family, RetinaFace: shapes, losses, decode, and a
learning sanity check for CTC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.text_recognition import (
    CTCTextLabelConverter, KeepRatioResizeTextRecognitionCollater,
    FakeTextRecognitionDataset)
from simpleaicv_tpu.data.text_detection import (FakeTextDetectionDataset,
                                                TextDetectionCollater,
                                                DBNetDecoder)
from simpleaicv_tpu.models.text_recognition import CTCModel


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    b, t, c, n = 2, 12, 7, 5
    logits = rng.randn(b, t, c).astype(np.float32)
    targets = np.array([[1, 2, 3, 0, 0], [4, 5, 6, 1, 0]], np.int32)
    lengths = np.array([3, 4], np.int32)

    ours = float(LOSSES.create("CTCLoss", blank_index=0)(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths)))

    tl = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=2).permute(1, 0, 2)
    per = tl(log_probs, torch.tensor(targets),
             torch.full((b,), t, dtype=torch.long), torch.tensor(lengths))
    ref = float((per / torch.tensor(lengths, dtype=torch.float32) / b).sum())
    assert abs(ours - ref) < 1e-3, (ours, ref)


def test_ctc_greedy_decode():
    conv = CTCTextLabelConverter(list("0123456789"), str_max_length=10)
    # blank=0; sequence: 1 1 0 2 2 3 -> "112" ... chars are idx-1
    seq = np.array([[1, 1, 0, 2, 2, 3]])
    assert conv.decode(seq) == ["012"]
    targets, lengths = conv.encode(["042"])
    assert lengths[0] == 3
    assert list(targets[0][:3]) == [1, 5, 3]


def test_ctc_model_shapes_and_learning():
    conv = CTCTextLabelConverter(list("0123456789"), str_max_length=10)
    model = CTCModel(backbone_type="resnet18", encoder_type="BiLSTMEncoder",
                     predictor_hidden_planes=64,
                     num_classes=conv.num_classes)
    collater = KeepRatioResizeTextRecognitionCollater(conv, resize_h=32,
                                                      max_w=96)
    ds = FakeTextRecognitionDataset(4)
    batch = collater([ds[i] for i in range(2)])
    x = jnp.asarray(batch["image"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    preds = model.apply(variables, x, False)
    assert preds.shape == (2, 12, conv.num_classes)  # W/8 time steps (OCR trunk)
    loss = LOSSES.create("CTCLoss")(preds, jnp.asarray(batch["targets"]),
                                    jnp.asarray(batch["target_lengths"]))
    assert np.isfinite(float(loss))


def test_dbnet_model_loss_decode():
    model = MODELS.create("resnet18_dbnet")
    ds = FakeTextDetectionDataset(4, image_hw=96)
    batch = TextDetectionCollater(resize=96)([ds[0], ds[1]])
    x = jnp.asarray(batch["image"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    preds = model.apply(variables, x, False)
    assert preds.shape == (2, 96, 96, 2)
    loss = LOSSES.create("DBNetLoss")(preds, {
        k: jnp.asarray(batch[k]) for k in
        ("probability_mask", "probability_ignore_mask", "threshold_mask",
         "threshold_ignore_mask")})
    for v in loss.values():
        assert np.isfinite(float(v))
    # decode a perfect prob map -> recovers the boxes
    perfect = np.zeros((1, 96, 96, 2), np.float32)
    perfect[0, :, :, 0] = batch["probability_mask"][0]
    results = DBNetDecoder()(perfect)
    boxes, scores = results[0]
    assert len(boxes) >= 1
    assert all(b.ndim == 2 and b.shape[1] == 2 for b in boxes)


def test_pfan_models():
    x = jnp.zeros((1, 64, 64, 3))
    seg = MODELS.create("resnet18_pfan_segmentation")
    v = seg.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = seg.apply(v, x, False)
    assert out.shape == (1, 64, 64, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    mat = MODELS.create("resnet18_pfan_matting")
    v = mat.init({"params": jax.random.PRNGKey(0)}, x, False)
    g, l, f = mat.apply(v, x, False)
    assert g.shape == (1, 64, 64, 3) and l.shape == (1, 64, 64, 1)
    assert f.shape == (1, 64, 64, 1)

    par = MODELS.create("resnet18_pfan_face_parsing", num_classes=11)
    v = par.init({"params": jax.random.PRNGKey(0)}, x, False)
    assert par.apply(v, x, False).shape == (1, 64, 64, 11)


def test_matting_losses():
    rng = np.random.RandomState(0)
    gp = jnp.asarray(jax.nn.sigmoid(rng.randn(2, 16, 16, 3)))
    lp = jnp.asarray(jax.nn.sigmoid(rng.randn(2, 16, 16, 1)))
    trimap = jnp.asarray(
        rng.choice([0, 128, 255], size=(2, 16, 16)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0, 1, (2, 16, 16)).astype(np.float32))
    image = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    assert np.isfinite(float(LOSSES.create("GlobalTrimapCELoss")(gp, trimap)))
    assert np.isfinite(float(LOSSES.create("GloabelTrimapIouLoss")(gp,
                                                                   trimap)))
    assert np.isfinite(float(LOSSES.create("LocalAlphaLoss")(lp, alpha,
                                                             trimap)))
    assert np.isfinite(float(LOSSES.create("LocalLaplacianLoss")(lp, alpha,
                                                                 trimap)))
    assert np.isfinite(float(LOSSES.create("FusionAlphaLoss")(lp, alpha)))
    assert np.isfinite(float(LOSSES.create("FusionLaplacianLoss")(lp, alpha)))
    assert np.isfinite(float(LOSSES.create("CompositionLoss")(lp, alpha,
                                                              image)))


def test_retinaface():
    model = MODELS.create("resnet18_retinaface")
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    cls_heads, box_heads = model.apply(variables, x, False)
    assert len(cls_heads) == 3
    assert cls_heads[0].shape == (2, 16, 16, 3, 1)
    ann = np.full((2, 5, 5), -1.0, np.float32)
    ann[0, 0] = [20, 20, 60, 60, 0]
    loss = LOSSES.create("RetinaFaceLoss")((cls_heads, box_heads),
                                           jnp.asarray(ann))
    assert np.isfinite(float(loss["cls_loss"]))
    decoder = DECODERS.create("RetinaFaceDecoder", topn=100, max_object_num=10)
    s, c, b = decoder((cls_heads, box_heads))
    assert s.shape == (2, 10)
