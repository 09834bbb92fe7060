"""Per-family end-to-end LEARNING proofs (VERDICT r4 ask #2).

`tests/test_convergence.py` proves the classification loop learns; these
tests extend that to the non-classification verticals. Parity tests pin
per-op/per-loss semantics on fixed inputs; these prove the ASSEMBLED loop —
assignment -> loss -> grads -> optimizer -> (decode) -> task metric — can
actually optimize, per family, through the real Trainer/CLI stack:

- detection: FCOS on drawn rectangles -> COCO mAP through the real
  FCOSDecoder + CocoMAPEvaluator (reference integration proof:
  /root/reference/results.md COCO tables, tools/scripts.py:694-836).
- semantic segmentation: DeepLabV3+ on colored blobs -> histogram mIoU
  (reference tools/scripts.py:1053-1427).
- interactive segmentation: tiny SAM on bright ellipses -> point-prompt
  IoU through the SAMTrainer refinement loop (reference
  tools/interactive_segmentation_scripts.py:821-1064).
- diffusion: tiny DDPM on a two-mode toy -> the DDPM sampler reproduces
  BOTH modes (reference tools/diffusion_scripts.py:19-349).

Thresholds carry wide margins below the calibrated on-chip trajectories
(see ROADMAP round-5): FCOS best mAP ~0.51-0.71 by epoch 16 vs 0.30
asserted; seg/SAM/DDPM likewise.
"""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_fcos_detection_learns(tmp_path):
    """FCOS: loss -> optimizer -> real decoder -> COCO mAP rises far above
    chance on a separable drawn-rectangle task."""
    import jax.numpy as jnp

    from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.data.datasets.synthetic import (
        LearnableDetectionDataset)
    from simpleaicv_tpu.data.detection import (DetectionResize,
                                               RandomHorizontalFlip,
                                               Normalize, DetectionCollater)
    from simpleaicv_tpu.data.transforms import Compose
    from simpleaicv_tpu.tasks import detection

    S = 96

    class config:
        network = "resnet18_fcos"
        num_classes = 3
        input_image_size = S
        model = MODELS.create(network, num_classes=num_classes, planes=64)
        train_criterion = LOSSES.create("FCOSLoss")
        decoder = DECODERS.create("FCOSDecoder", topn=100, max_object_num=20)
        train_dataset = LearnableDetectionDataset(
            64, S, "train",
            transform=Compose([
                DetectionResize(resize=S, resize_type="yolo_style"),
                RandomHorizontalFlip(prob=0.5),
                Normalize(),
            ]))
        test_dataset = LearnableDetectionDataset(
            16, S, "val",
            transform=Compose([
                DetectionResize(resize=S, resize_type="yolo_style"),
                Normalize(),
            ]))
        train_collater = DetectionCollater(resize=S, resize_type="yolo_style")
        test_collater = DetectionCollater(resize=S, resize_type="yolo_style")
        seed = 0
        batch_size = 16
        num_workers = 2
        accumulation_steps = 1
        optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                               "weight_decay": 1e-3,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-5})
        epochs = 16
        print_interval = 100
        use_ema_model = False

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        return detection.evaluate_coco(config.model, params, state_vars,
                                       config.decoder, loader,
                                       config.num_classes)

    trainer = Trainer(
        config, str(tmp_path),
        make_loss_fn=detection.make_loss_fn,
        make_eval_fn=None,
        evaluate=evaluate,
        init_batch={"image": jnp.zeros((2, S, S, 3), jnp.float32)})
    best = trainer.run()
    # calibrated on-chip: best mAP[0.5:0.95]*100 reaches ~51 by epoch 8 and
    # ~58-71 by epoch 16; mAP@0.5 hits 1.0 from epoch 7. Chance level ~0.
    assert best >= 30.0, f"FCOS failed to learn: best mAP {best:.2f}"
    final = evaluate(None, trainer.eval_params(), trainer.state.state_vars,
                     trainer.test_loader, None)
    assert final["IoU=0.5,area=all,maxDets=100,mAP"] >= 0.5, final


@pytest.mark.slow
def test_deeplab_semantic_segmentation_learns(tmp_path):
    """DeepLabV3+: dense CE -> optimizer -> histogram mIoU eval reaches
    near-perfect segmentation of separable colored blobs."""
    from simpleaicv_tpu.core.registry import MODELS, LOSSES
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.data.segmentation import (
        FakeSegmentationDataset, SegNormalize, SemanticSegmentationCollater)
    from simpleaicv_tpu.data.transforms import Compose
    from simpleaicv_tpu.tasks import semantic_segmentation as seg_task

    class config:
        network = "resnet18_deeplabv3plus"
        num_classes = 6
        input_image_size = 64
        ignore_index = 255
        model = MODELS.create(network, num_classes=num_classes)
        train_criterion = LOSSES.create("SegCELoss",
                                        ignore_index=ignore_index)
        train_dataset = FakeSegmentationDataset(
            64, 64, num_classes, transform=Compose([SegNormalize()]))
        test_dataset = FakeSegmentationDataset(
            16, 64, num_classes, transform=Compose([SegNormalize()]))
        train_collater = SemanticSegmentationCollater(resize=64)
        test_collater = SemanticSegmentationCollater(resize=64)
        seed = 0
        batch_size = 16
        num_workers = 2
        accumulation_steps = 1
        optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                               "weight_decay": 1e-3,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("PolyLR", {"warm_up_epochs": 0, "power": 0.9})
        epochs = 12
        print_interval = 100
        use_ema_model = False

    trainer = Trainer(
        config, str(tmp_path),
        make_loss_fn=seg_task.make_loss_fn,
        make_eval_fn=lambda model: seg_task.make_eval_fn(
            model, config.num_classes, config.ignore_index),
        evaluate=seg_task.make_evaluate(config.num_classes,
                                        config.ignore_index))
    best = trainer.run()
    assert best >= 60.0, f"DeepLab failed to learn: best mIoU {best:.2f}"


@pytest.mark.slow
def test_sam_interactive_segmentation_learns(tmp_path):
    """Tiny SAM through the real SAMTrainer (per-batch prompt modality,
    iterative error-region refinement): point-prompt IoU rises far above
    chance on bright-ellipse objects."""
    from simpleaicv_tpu.core.registry import MODELS, LOSSES
    from simpleaicv_tpu.data.interactive_segmentation import (
        FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)

    train_is = _load_tool("train_interactive_segmentation")
    S = 64

    class config:
        network = "sam_b"
        input_image_size = S
        model = MODELS.create(
            network, image_size=S,
            image_encoder_embedding_planes=64, image_encoder_block_nums=2,
            image_encoder_head_nums=2, image_encoder_window_size=2,
            image_encoder_global_attn_indexes=(1,),
            prompt_encoder_embedding_planes=64)
        train_criterion = LOSSES.create("SAMMultiLevelLoss")
        train_dataset = FakeSAMSegmentationDataset(
            32, S, transform=SamResize(S))
        test_dataset = {
            "setA": FakeSAMSegmentationDataset(8, S, transform=SamResize(S)),
        }
        train_collater = SAMBatchCollater(resize=S)
        test_collater = SAMBatchCollater(resize=S, use_noise_bbox=False)
        prompt_probs = {"point": 0.34, "box": 0.33, "mask": 0.33}
        decoder_point_iters = 2
        seed = 0
        batch_size = 8
        num_workers = 2
        accumulation_steps = 1
        optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                               "weight_decay": 1e-3,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0})
        epochs = 40
        print_interval = 100
        use_ema_model = False

    trainer = train_is.SAMTrainer(config, str(tmp_path))
    best = trainer.run()
    assert best >= 0.5, f"SAM failed to learn: best IoU {best:.4f}"


@pytest.mark.slow
def test_ddpm_learns_two_mode_distribution(tmp_path):
    """Tiny DDPM through the full Trainer on a two-mode toy; the DDPM
    reverse-process sampler must reproduce BOTH modes (distribution
    learning, not just a loss floor)."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_tpu.core.registry import MODELS
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.data.datasets.synthetic import TwoModeImageDataset
    from simpleaicv_tpu.diffusion import DDPMTrainer, DDPMSampler
    from simpleaicv_tpu.tasks import diffusion as diff_task
    from simpleaicv_tpu.tasks.diffusion import MSELoss

    S = 16

    class _DiffusionCollater:

        def __call__(self, samples):
            images = np.stack([s["image"] for s in samples]).astype(
                np.float32)
            return {"image": images / 127.5 - 1.0,
                    "label": np.asarray([s["label"] for s in samples],
                                        np.int32)}

    class config:
        network = "DiffusionUNet"
        input_image_size = S
        model = MODELS.create(network, inplanes=3, planes=32,
                              planes_multi=(1, 2), time_embedding_ratio=4,
                              block_nums=1,
                              use_attention_planes_multi_idx=(1,))
        # cosine, not linear: at t=100 the reference-parity linear
        # schedule leaves alpha_bar_T = 0.36 (the forward process never
        # reaches the noise prior the sampler starts from); cosine
        # reaches alpha_bar_T ~ 2e-7 at the same step count
        trainer = DDPMTrainer(beta_schedule_mode="cosine", t=100)
        train_criterion = MSELoss()
        train_dataset = TwoModeImageDataset(64, S)
        test_dataset = None
        train_collater = _DiffusionCollater()
        test_collater = None
        seed = 0
        batch_size = 16
        num_workers = 2
        accumulation_steps = 1
        optimizer = ("AdamW", {"lr": 2e-3, "global_weight_decay": False,
                               "weight_decay": 0.0,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0})
        epochs = 90
        print_interval = 100
        use_ema_model = False

    raw_model = config.model

    def make_loss_fn(model, criterion):
        return diff_task.make_loss_fn(raw_model, criterion, config.trainer)

    class _Wrap:
        """UNet takes (x, t, class_label, train): adapt init for Trainer."""

        def __init__(self, m):
            self._m = m

        def init(self, rngs, x, train):
            return self._m.init(rngs, x,
                                jnp.zeros((x.shape[0],), jnp.int32), None,
                                train)

        def apply(self, *a, **k):
            return self._m.apply(*a, **k)

    config.model = _Wrap(raw_model)
    trainer = Trainer(
        config, str(tmp_path), make_loss_fn=make_loss_fn,
        init_batch={"image": jnp.zeros((2, S, S, 3), jnp.float32)})
    trainer.run()

    sampler = DDPMSampler(beta_schedule_mode="cosine", t=100)
    generate = diff_task.make_generate_fn(raw_model, sampler, (64, S, S, 3))
    imgs = np.asarray(generate(trainer.eval_params(),
                               trainer.state.state_vars,
                               jax.random.PRNGKey(123)))
    means = imgs.mean(axis=(1, 2, 3))
    hi = float((means > 0.3).mean())
    lo = float((means < -0.3).mean())
    near = np.minimum(np.abs(means - 0.6), np.abs(means + 0.6))
    # both modes present and samples gather around them: an untrained
    # sampler gives hi = lo = 0 and near.mean ~ 0.6 (prior samples are
    # zero-mean); calibrated CPU-mesh trajectory reaches hi/lo ~ 0.3-0.6
    # and near.mean ~ 0.15-0.25 by epoch 90
    assert hi >= 0.15 and lo >= 0.15, (hi, lo, means)
    assert float(near.mean()) <= 0.33, (float(near.mean()), means)


@pytest.mark.slow
def test_dbnet_text_detection_learns(tmp_path):
    """DBNet: shrink/threshold map losses -> optimizer -> host contour
    decode (DBNetDecoder) -> polygon P/R/F1 rises far above chance on
    separable white text-rectangles (reference integration proof:
    tools/text_scripts.py:1421-1674)."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_tpu.core.registry import MODELS, LOSSES
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.data.text_detection import (FakeTextDetectionDataset,
                                                    TextDetectionCollater,
                                                    DBNetDecoder)
    from simpleaicv_tpu.evaluation.text_eval import evaluate_text_detection

    td = _load_tool("train_text_detection")

    class config:
        network = "resnet18_dbnet"
        input_image_size = 128
        model = MODELS.create(network)
        train_criterion = LOSSES.create("DBNetLoss")
        train_dataset = FakeTextDetectionDataset(num_samples=32,
                                                 image_hw=128)
        test_dataset = FakeTextDetectionDataset(num_samples=8, image_hw=128)
        train_collater = TextDetectionCollater(resize=128)
        test_collater = TextDetectionCollater(resize=128)
        seed = 0
        batch_size = 8
        num_workers = 2
        accumulation_steps = 1
        optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                               "weight_decay": 1e-3,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-5})
        epochs = 20
        print_interval = 100
        use_ema_model = False

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        decoder = DBNetDecoder()
        forward = jax.jit(lambda p, sv, x: config.model.apply(
            {"params": p, **sv}, x, False))
        results = []
        for batch in loader:
            preds = np.asarray(forward(params, state_vars,
                                       jnp.asarray(batch["image"])))
            for (boxes, _s), gt in zip(decoder(preds), batch["polys"]):
                results.append({"pred_polys": list(boxes),
                                "gt_polys": list(gt),
                                "gt_ignore": [False] * len(gt)})
        stats = evaluate_text_detection(results)
        stats["key_metric"] = stats.get("f1", 0.0)
        return stats

    trainer = Trainer(config, str(tmp_path), make_loss_fn=td.make_loss_fn)
    trainer.evaluate = evaluate
    trainer.eval_step = lambda *a, **k: None
    best = trainer.run()
    # calibrated CPU-mesh trajectory: F1 21 -> 38 -> 69 -> 87 over epochs
    # 9-12, ~90 by epoch 14; chance level 0 (decoder finds no contours on
    # an untrained prob map)
    assert best >= 40.0, f"DBNet failed to learn: best F1 {best:.2f}"
