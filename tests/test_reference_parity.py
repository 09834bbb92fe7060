"""Cross-framework numeric parity against the ACTUAL reference implementation.

Each test instantiates a real torch module from /root/reference on CPU,
exports its (seeded random-init) ``state_dict``, converts it with
``core/converters.py``, loads it into the corresponding flax model, and
asserts the two frameworks produce the same outputs on a shared fixture
batch.  This validates, in one stroke: the converter name-maps on *genuine*
state_dicts, the model ports' math, and (where losses/decodes are compared)
the train-step chain.  Reference: e.g.
simpleAICV/classification/backbones/resnet.py:248-271.

Models run in f32 (set_compute_dtype) so the comparison is exact-math, not
bf16-noise; tolerances absorb conv-layout/accumulation-order differences.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._reference import (ref_module, seed_all, state_dict_numpy,
                              to_torch_nchw, torch)

from simpleaicv_tpu.core.converters import (apply_converted,
                                            convert_official_state_dict)
from simpleaicv_tpu.models import common as model_common


@pytest.fixture(autouse=True)
def _f32_models():
    model_common.set_compute_dtype(jnp.float32)
    yield
    model_common.set_compute_dtype(jnp.bfloat16)


def _count_leaves(tree) -> int:
    if not isinstance(tree, dict):
        return 1
    return sum(_count_leaves(v) for v in tree.values())


def _load(flax_model, init_args, sd, family, min_loaded):
    variables = flax_model.init(jax.random.PRNGKey(0), *init_args)
    converted = convert_official_state_dict(sd, family)
    # every converted reference tensor must find a slot in the flax model
    n_conv = sum(_count_leaves(converted[c]) for c in converted)
    variables, n = apply_converted(variables, converted)
    assert n >= min_loaded, f"only {n} tensors loaded (< {min_loaded})"
    assert n == n_conv, f"loaded {n} of {n_conv} converted tensors"
    return variables


def _close(ours, theirs, atol=2e-4, rtol=2e-3, msg=""):
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(theirs, np.float32),
                               atol=atol, rtol=rtol, err_msg=msg)


# ---------------------------------------------------------------- resnet ----

@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_resnet_classification_parity(name):
    ref = ref_module("simpleAICV.classification.backbones.resnet")
    seed_all(0)
    tm = getattr(ref, name)(num_classes=37).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.backbones import resnet as ours
    fm = getattr(ours, name)(num_classes=37)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_resnet", 50)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy()
    _close(y_ours, y_ref, msg=f"{name} logits")


# ------------------------------------------------------------------- vit ----

def test_vit_classification_parity():
    ref = ref_module("simpleAICV.classification.backbones.vit")
    seed_all(0)
    tm = ref.vit_base_patch16(image_size=64, num_classes=13).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.backbones.vit import vit_base_patch16
    fm = vit_base_patch16(image_size=64, num_classes=13)
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "mae_vit", 100)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy()
    _close(y_ours, y_ref, msg="vit_b16 logits")


# ------------------------------------------------------------------ fcos ----

def test_fcos_parity():
    ref = ref_module("simpleAICV.detection.models.fcos")
    seed_all(0)
    tm = ref.resnet50_fcos(num_classes=20).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.detection.fcos import resnet50_fcos
    fm = resnet50_fcos(num_classes=20)
    x = np.random.RandomState(3).rand(2, 160, 160, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_fcos", 100)

    cls_o, reg_o, cnt_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        cls_r, reg_r, cnt_r = tm(to_torch_nchw(x))
    assert len(cls_o) == len(cls_r) == 5
    for lvl in range(5):
        _close(cls_o[lvl], cls_r[lvl].numpy(), atol=1e-4,
               msg=f"fcos cls level {lvl}")
        _close(reg_o[lvl], reg_r[lvl].numpy(), atol=5e-4,
               msg=f"fcos reg level {lvl}")
        _close(cnt_o[lvl], cnt_r[lvl].numpy(), atol=1e-4,
               msg=f"fcos centerness level {lvl}")


# ------------------------------------------------------------- retinanet ----

def test_retinanet_parity():
    ref = ref_module("simpleAICV.detection.models.retinanet")
    seed_all(0)
    tm = ref.resnet50_retinanet(num_classes=20).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.detection.retinanet import resnet50_retinanet
    fm = resnet50_retinanet(num_classes=20)
    x = np.random.RandomState(5).rand(2, 160, 160, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_retinanet", 100)

    cls_o, reg_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        cls_r, reg_r = tm(to_torch_nchw(x))
    for lvl in range(5):
        b, h, w, a, c = cls_o[lvl].shape
        _close(cls_o[lvl].reshape(b, h, w, a * c), cls_r[lvl].numpy()
               .reshape(b, h, w, a * c), atol=1e-4,
               msg=f"retinanet cls level {lvl}")
        _close(reg_o[lvl].reshape(b, h, w, a * 4), reg_r[lvl].numpy()
               .reshape(b, h, w, a * 4), atol=5e-4,
               msg=f"retinanet reg level {lvl}")


# ------------------------------------------------------------- deeplab ------

def test_deeplabv3plus_parity():
    ref = ref_module("simpleAICV.semantic_segmentation.models.deeplabv3plus")
    seed_all(0)
    tm = ref.resnet50_deeplabv3plus(num_classes=19).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.segmentation.deeplabv3plus import (
        resnet50_deeplabv3plus)
    fm = resnet50_deeplabv3plus(num_classes=19)
    x = np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_deeplab", 100)

    y = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yr = tm(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    _close(y, yr, atol=5e-4, msg="deeplabv3plus logits")


# ---------------------------------------------------------------- pfan ------

def test_pfan_segmentation_parity():
    ref = ref_module(
        "simpleAICV.salient_object_detection.models.pfan_segmentation")
    seed_all(0)
    tm = ref.resnet50_pfan_segmentation().eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import MODELS
    fm = MODELS.create("resnet50_pfan_segmentation")
    x = np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_pfan_segmentation", 100)

    y = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yr = tm(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    _close(y, yr, atol=1e-4, msg="pfan salient pred")


def test_pfan_matting_parity():
    ref = ref_module("simpleAICV.human_matting.models.pfan_matting")
    seed_all(0)
    tm = ref.resnet50_pfan_matting().eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import MODELS
    fm = MODELS.create("resnet50_pfan_matting")
    x = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_pfan_matting", 100)

    g_o, l_o, f_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        outs = tm(to_torch_nchw(x))
    g_r, l_r, f_r = [o.numpy().transpose(0, 2, 3, 1) for o in outs]
    _close(g_o, g_r, atol=1e-4, msg="pfan matting global")
    _close(l_o, l_r, atol=1e-4, msg="pfan matting local")
    _close(f_o, f_r, atol=1e-4, msg="pfan matting fused")


# --------------------------------------------------------------- dbnet ------

def test_dbnet_parity():
    ref = ref_module("simpleAICV.text_detection.models.dbnet")
    seed_all(0)
    tm = ref.resnet50_dbnet().eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import MODELS
    fm = MODELS.create("resnet50_dbnet")
    x = np.random.RandomState(8).rand(1, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_dbnet", 100)

    y = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yr = tm(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    _close(y, yr, atol=1e-3, msg="dbnet prob/thresh maps")


# ----------------------------------------------------------------- ctc ------

def test_ctc_model_parity():
    ref = ref_module("simpleAICV.text_recognition.models.ctc_model")
    seed_all(0)
    model_config = {
        "backbone": {"name": "resnet34backbone",
                     "param": {"pretrained_path": ""}},
        "encoder": {"name": "BiLSTMEncoder", "param": {}},
        "predictor": {"name": "CTCPredictor",
                      "param": {"hidden_planes": 64, "num_classes": 37}},
    }
    tm = ref.CTCModel(model_config).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.text_recognition import CTCModel
    fm = CTCModel(backbone_type="resnet34", encoder_type="BiLSTMEncoder",
                  predictor_hidden_planes=64, num_classes=37)
    x = np.random.RandomState(9).rand(1, 32, 48, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_ctc", 100)

    y = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        yr = tm(to_torch_nchw(x)).numpy()
    assert y.shape == tuple(yr.shape), (y.shape, yr.shape)
    _close(y, yr, atol=5e-4, msg="ctc logits (OCR trunk + 2xBiLSTM)")


# ------------------------------------------------------------ retinaface ----

def test_retinaface_parity():
    ref = ref_module("simpleAICV.face_detection.models.retinaface")
    seed_all(0)
    tm = ref.resnet50_retinaface().eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.face_detection import resnet50_retinaface
    fm = resnet50_retinaface()
    x = np.random.RandomState(10).rand(1, 160, 160, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_retinaface", 100)

    cls_o, box_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        cls_r, box_r = tm(to_torch_nchw(x))
    # random-init eval-mode BN (unit running stats) lets activations grow to
    # O(100) by C5, so compare at a scale-aware tolerance
    for lvl in range(3):
        co = np.asarray(cls_o[lvl])
        bo = np.asarray(box_o[lvl])
        cr = cls_r[lvl].numpy().reshape(co.shape[0], co.shape[1],
                                        co.shape[2], -1)
        br = box_r[lvl].numpy().reshape(bo.shape[0], bo.shape[1],
                                        bo.shape[2], -1)
        _close(co.reshape(cr.shape), cr, atol=5e-3,
               msg=f"retinaface cls level {lvl}")
        scale = max(1.0, float(np.abs(br).max()))
        assert np.abs(bo.reshape(br.shape) - br).max() / scale < 2e-4, \
            f"retinaface box level {lvl}"


# -------------------------------------------------------- diffusion unet ----

@pytest.mark.parametrize("num_classes", [None, 5])
def test_diffusion_unet_parity(num_classes):
    ref = ref_module("simpleAICV.diffusion_model.models.diffusion_unet")
    seed_all(0)
    tm = ref.DiffusionUNet(inplanes=3, planes=32, planes_multi=[1, 2],
                           time_embedding_ratio=4, block_nums=2,
                           dropout_prob=0.0, num_groups=8,
                           use_attention_planes_multi_idx=[0, 1],
                           num_classes=num_classes).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.diffusion_unet import DiffusionUNet
    fm = DiffusionUNet(inplanes=3, planes=32, planes_multi=(1, 2),
                       time_embedding_ratio=4, block_nums=2,
                       dropout_prob=0.0, num_groups=8,
                       use_attention_planes_multi_idx=(0, 1),
                       num_classes=num_classes)
    x = np.random.RandomState(11).rand(2, 16, 16, 3).astype(np.float32)
    t = np.asarray([3, 500], np.int64)
    labels = np.asarray([1, 4], np.int64) if num_classes else None
    init_args = (jnp.asarray(x), jnp.asarray(t))
    if num_classes:
        init_args = init_args + (jnp.asarray(labels),)
    variables = _load(fm, init_args, sd, "ref_diffusion_unet", 100)

    y = np.asarray(fm.apply(variables, *init_args))
    with torch.no_grad():
        args = (to_torch_nchw(x), torch.from_numpy(t))
        if num_classes:
            args = args + (torch.from_numpy(labels),)
        yr = tm(*args).numpy().transpose(0, 2, 3, 1)
    _close(y, yr, atol=1e-4, msg="diffusion unet eps prediction")


# ----------------------------------------------------------------- sam ------

def test_sam_parity():
    ref = ref_module(
        "simpleAICV.interactive_segmentation.models.segment_anything.sam")
    seed_all(0)
    kw = dict(image_size=128, patch_size=16,
              image_encoder_embedding_planes=96,
              image_encoder_block_nums=4, image_encoder_head_nums=3,
              image_encoder_window_size=4,
              prompt_encoder_embedding_planes=64,
              prompt_encoder_mask_inter_planes=8)
    tm = ref.SAM(image_encoder_global_attn_indexes=[1, 3], **kw).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.interactive_segmentation.sam import SAM
    fm = SAM(image_encoder_global_attn_indexes=(1, 3), **kw)
    x = np.random.RandomState(12).rand(2, 128, 128, 3).astype(np.float32)
    pts = np.zeros((2, 2, 3), np.float32)
    pts[:, :, :2] = np.random.RandomState(13).rand(2, 2, 2) * 128
    pts[:, :, 2] = 1.0
    boxes = np.asarray([[10, 10, 100, 100], [20, 30, 90, 110]], np.float32)
    init_prompts = {"prompt_point": jnp.asarray(pts),
                    "prompt_box": jnp.asarray(boxes),
                    "prompt_mask": jnp.zeros((2, 32, 32, 1))}
    variables = _load(fm, (jnp.asarray(x), init_prompts), sd, "ref_sam", 100)

    # point + box prompts
    prompts = {"prompt_point": jnp.asarray(pts),
               "prompt_box": jnp.asarray(boxes), "prompt_mask": None}
    masks_o, iou_o = fm.apply(variables, jnp.asarray(x), prompts)
    with torch.no_grad():
        bp = {"prompt_point": torch.from_numpy(pts),
              "prompt_box": torch.from_numpy(boxes), "prompt_mask": None}
        masks_r, iou_r = tm(to_torch_nchw(x), bp)
    _close(masks_o, masks_r.numpy(), atol=5e-3, msg="sam masks (point+box)")
    _close(iou_o, iou_r.numpy(), atol=2e-3, msg="sam iou predictions")

    # point + mask prompts
    pm = np.random.RandomState(14).rand(2, 32, 32, 1).astype(np.float32)
    prompts2 = {"prompt_point": jnp.asarray(pts), "prompt_box": None,
                "prompt_mask": jnp.asarray(pm)}
    masks_o2, _ = fm.apply(variables, jnp.asarray(x), prompts2)
    with torch.no_grad():
        bp2 = {"prompt_point": torch.from_numpy(pts), "prompt_box": None,
               "prompt_mask": torch.from_numpy(pm.transpose(0, 3, 1, 2))}
        masks_r2, _ = tm(to_torch_nchw(x), bp2)
    _close(masks_o2, masks_r2.numpy(), atol=5e-2,
           msg="sam masks (mask prompt)")


# ---------------------------------------------------------------- detr ------

def test_detr_parity():
    ref = ref_module("simpleAICV.detection.models.detr")
    seed_all(0)
    tm = ref.resnet50_detr(num_classes=20).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.detection.detr import resnet50_detr
    fm = resnet50_detr(num_classes=20)
    x = np.random.RandomState(15).rand(1, 128, 128, 3).astype(np.float32)
    masks = np.zeros((1, 128, 128), np.float32)
    masks[:, 100:, :] = 1.0   # padded rows exercise the additive float mask
    variables = _load(fm, (jnp.asarray(x), jnp.asarray(masks)), sd,
                      "ref_detr", 100)

    cls_o, reg_o = fm.apply(variables, jnp.asarray(x), jnp.asarray(masks))
    with torch.no_grad():
        cls_r, reg_r = tm(to_torch_nchw(x), torch.from_numpy(masks).bool())
    _close(cls_o, cls_r.numpy(), atol=5e-4, msg="detr cls (6 layers)")
    _close(reg_o, reg_r.numpy(), atol=1e-4, msg="detr boxes")


# ------------------------------------------------------------ dino-detr -----

def test_dinodetr_parity():
    """Full-forward eval parity for DINO-DETR against the actual reference
    (dinodetr.py:302-408 + deformable_transformer.py:105-720), with the MSDA
    CUDA package stubbed onto the reference's own pure-torch core
    (multiscale_deformable_attention.py:43-74). Exercises: detr_resnet
    backbone, 5-level input projections, 6-layer deformable encoder,
    two-stage proposal selection (unmasked top-k over zero-filled invalid
    memory), and the 6-layer decoder with the reference's fixed-anchor
    refinement semantics."""
    ref = ref_module("simpleAICV.detection.models.dinodetr")
    seed_all(0)
    tm = ref.resnet50_dinodetr(num_classes=20, dn_labelbook_size=20,
                               query_nums=300).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.detection.dinodetr import resnet50_dinodetr
    fm = resnet50_dinodetr(num_classes=20, query_nums=300)
    x = np.random.RandomState(21).rand(1, 192, 192, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_dinodetr", 400)

    out_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        out_r = tm(to_torch_nchw(x),
                   torch.zeros(1, 192, 192, dtype=torch.bool))

    _close(out_o["pred_logits"], out_r["pred_logits"].numpy(), atol=1e-3,
           rtol=1e-2, msg="dinodetr pred_logits")
    _close(out_o["pred_boxes"], out_r["pred_boxes"].numpy(), atol=1e-3,
           rtol=1e-2, msg="dinodetr pred_boxes")
    _close(out_o["interm_pred_logits"],
           out_r["interm_outputs"]["pred_logits"].numpy(), atol=1e-3,
           rtol=1e-2, msg="dinodetr interm logits")
    _close(out_o["interm_pred_boxes"],
           out_r["interm_outputs"]["pred_boxes"].numpy(), atol=1e-3,
           rtol=1e-2, msg="dinodetr interm boxes")
    for l, aux in enumerate(out_r["aux_outputs"]):
        _close(out_o["aux_pred_logits"][l], aux["pred_logits"].numpy(),
               atol=1e-3, rtol=1e-2, msg=f"dinodetr aux logits layer {l}")
        _close(out_o["aux_pred_boxes"][l], aux["pred_boxes"].numpy(),
               atol=1e-3, rtol=1e-2, msg=f"dinodetr aux boxes layer {l}")


# --------------------------------------------------------------- solov2 -----

def test_solov2_parity():
    ref = ref_module("simpleAICV.instance_segmentation.models.solov2")
    seed_all(0)
    tm = ref.resnet50_solov2(num_classes=20).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.instance_segmentation.solov2 import (
        resnet50_solov2)
    fm = resnet50_solov2(num_classes=20)
    x = np.random.RandomState(16).rand(1, 160, 160, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x),), sd, "ref_solov2", 100)

    mask_o, kern_o, cate_o = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        out_r = tm(to_torch_nchw(x))
    mask_r, kern_r, cate_r = out_r
    _close(mask_o, mask_r.numpy().transpose(0, 2, 3, 1), atol=1e-3,
           msg="solov2 mask features")
    for lvl in range(5):
        _close(kern_o[lvl], kern_r[lvl].numpy().transpose(0, 2, 3, 1),
               atol=1e-3, msg=f"solov2 kernel preds level {lvl}")
        _close(cate_o[lvl], cate_r[lvl].numpy().transpose(0, 2, 3, 1),
               atol=1e-3, msg=f"solov2 cate preds level {lvl}")


# ----------------------------------------------------------- convformer -----

def test_convformer_parity():
    """Reference metaformer (simpleAICV/classification/backbones/
    convformer.py:267) through the 'convformer' converter — the first use of
    these rules on a genuine reference state_dict."""
    ref = ref_module("simpleAICV.classification.backbones.convformer")
    seed_all(0)
    tm = ref.convformer_s18(num_classes=11).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import BACKBONES
    fm = BACKBONES.create("convformer_s18", num_classes=11)
    x = np.random.RandomState(17).rand(2, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x), False), sd, "convformer", 200)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy()
    _close(y_ours, y_ref, msg="convformer_s18 logits")


# ----------------------------------------------------------- MAE pretrain ---

def test_mae_pretrain_parity():
    """Reference VITMAEPretrainModel (simpleAICV/masked_image_modeling/
    models/vit_mae.py:370-460) vs our flax MAE at mask_ratio=0.

    With ratio 0 every patch is kept: the per-sample shuffle differs between
    the frameworks' RNGs but the decoder unshuffles via restore_ids and the
    transformer is permutation-equivariant once pos-embeds are pre-added, so
    the reconstruction is deterministic and comparable. This also verifies
    the two sincos position-encoding tables are numerically identical (they
    are dropped from the state_dict and recomputed on our side)."""
    ref = ref_module("simpleAICV.masked_image_modeling.models.vit_mae")
    seed_all(0)
    kw = dict(patch_size=16, image_size=64, mask_ratio=0.0,
              encoder_embedding_planes=64, encoder_block_nums=2,
              encoder_head_nums=2, decoder_embedding_planes=32,
              decoder_block_nums=2, decoder_head_nums=2)
    tm = ref.VITMAEPretrainModel(**kw).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.vit_mae import VITMAEPretrainModel
    fm = VITMAEPretrainModel(**kw)
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0),
                         "mask": jax.random.PRNGKey(1)}, jnp.asarray(x),
                        False)
    converted = convert_official_state_dict(sd, "ref_mae_pretrain")
    variables, n = apply_converted(variables, converted)
    assert n == len(jax.tree.leaves(variables["params"])), n

    pred_o, mask_o = fm.apply(variables, jnp.asarray(x), False)
    with torch.no_grad():
        pred_r, mask_r = tm(to_torch_nchw(x))
    assert float(jnp.sum(mask_o)) == float(mask_r.sum()) == 0.0
    _close(pred_o, pred_r.numpy(), atol=1e-5, msg="mae reconstruction")
    # the reconstruction target patchifiers agree too
    _close(fm.images_to_patch(jnp.asarray(x)),
           tm.images_to_patch(to_torch_nchw(x)).numpy(),
           atol=1e-7, msg="images_to_patch")


# -------------------------------------------------------------- sapiens -----

def test_sapiens_parsing_parity():
    """Reference ViTParsing (face_parsing/models/sapiens_face_parsing.py:97)
    == our SapiensParsing: ViTBackbone (learned pos-embed, no cls, no final
    norm) + VitHead (4x deconv-k4s2p1 + InstanceNorm + SiLU, 4x conv1x1 +
    IN + SiLU, pred conv). Small backbone for speed; covers the torch
    ConvTranspose(k4,s2,p1) <-> flax padding ((2,2),(2,2)) mapping."""
    ref = ref_module("simpleAICV.face_parsing.models.sapiens_face_parsing")
    seed_all(0)
    tm = ref.ViTParsing(backbone_type="vit_small_patch14_backbone",
                        image_size=56, planes=384, num_classes=7,
                        deconv_planes=(64, 48, 32, 16),
                        conv_planes=(16, 16, 8, 8)).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.models.sapiens_parsing import SapiensParsing
    fm = SapiensParsing(backbone_type="vit_small_patch14", image_size=56,
                        num_classes=7, deconv_planes=(64, 48, 32, 16),
                        conv_planes=(16, 16, 8, 8))
    x = np.random.RandomState(5).rand(1, 56, 56, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x), False), sd, "ref_sapiens", 150)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    _close(y_ours, y_ref, atol=5e-4, msg="sapiens parsing logits")


# --------------------------------------------------------------- yolact -----

def test_yolact_parity():
    """Reference YOLACT (instance_segmentation/models/yolact.py:256) == our
    YOLACT after the exact YOLACTFPN port (align_corners=True top-down,
    per-level pred conv + ReLU, stride-2 P6/P7 chains): every head output,
    the prototype masks and the auxiliary seg map match to 1e-7."""
    ref = ref_module("simpleAICV.instance_segmentation.models.yolact")
    seed_all(0)
    tm = ref.resnet18_yolact(num_classes=6).eval()
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import MODELS
    fm = MODELS.create("resnet18_yolact", num_classes=6)
    x = np.random.RandomState(8).rand(1, 160, 160, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x), False), sd, "ref_yolact", 100)

    cls_o, box_o, coef_o, proto_o, seg_o = fm.apply(variables,
                                                    jnp.asarray(x), False)
    with torch.no_grad():
        cls_r, box_r, coef_r, proto_r, seg_r = tm(to_torch_nchw(x))
    _close(proto_o, proto_r.numpy(), atol=1e-5, msg="yolact prototypes")
    _close(seg_o, seg_r.numpy().transpose(0, 2, 3, 1), atol=1e-5,
           msg="yolact seg aux")
    for lvl in range(5):
        _close(cls_o[lvl], cls_r[lvl].numpy(), atol=1e-5,
               msg=f"yolact cls level {lvl}")
        _close(box_o[lvl], box_r[lvl].numpy(), atol=1e-5,
               msg=f"yolact box level {lvl}")
        _close(coef_o[lvl], coef_r[lvl].numpy(), atol=1e-5,
               msg=f"yolact coef level {lvl}")


# ------------------------------------------------------------------ van -----

def test_van_parity():
    """Reference VAN-B0 (classification/backbones/van.py:322) through the
    new ref_van rules (incl. the (1,C,1,1)->(C,) layer_scale prepass);
    logits match to 1e-6 and EVERY converted tensor must land, so the
    constant-initialised layer scales can't silently skip."""
    ref = ref_module("simpleAICV.classification.backbones.van")
    seed_all(0)
    tm = ref.van_b0(num_classes=9).eval()
    # perturb the layer scales away from their shared constant init so the
    # test actually proves they are loaded, not just identically initialised
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "layer_scale" in name:
                p.add_(torch.randn_like(p) * 0.05)
    sd = state_dict_numpy(tm)

    from simpleaicv_tpu.core.registry import BACKBONES
    fm = BACKBONES.create("van_b0", num_classes=9)
    x = np.random.RandomState(21).rand(2, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x), False), sd, "ref_van", 300)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy()
    _close(y_ours, y_ref, msg="van_b0 logits")


# ------------------------------------------------- darknet / cifar resnet ---

@pytest.mark.parametrize("mod,fn,ours,fam,min_n", [
    ("darknet", "darknet19", "darknet19", "ref_darknet19", 80),
    ("resnetforcifar", "resnet18cifar", "resnet18cifar", "ref_resnet", 90),
])
def test_small_backbone_parity(mod, fn, ours, fam, min_n):
    """Darknet19 (classification/backbones/darknet.py:147) and the CIFAR
    ResNet (resnetforcifar.py:108) — the last two reference classification
    backbones without cross-framework parity evidence."""
    from simpleaicv_tpu.core.registry import BACKBONES
    ref = ref_module(f"simpleAICV.classification.backbones.{mod}")
    seed_all(0)
    tm = getattr(ref, fn)(num_classes=9).eval()
    sd = state_dict_numpy(tm)

    fm = BACKBONES.create(ours, num_classes=9)
    x = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    variables = _load(fm, (jnp.asarray(x), False), sd, fam, min_n)

    y_ours = np.asarray(fm.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        y_ref = tm(to_torch_nchw(x)).numpy()
    _close(y_ours, y_ref, msg=f"{fn} logits")
