"""Synthetic human-matting smoke experiment (CPU/TPU-runnable without the
matting datasets on disk; mirrors the shape of reference
7.human_matting_training/resnet50_pfan_matting/train_config.py)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.matting import (FakeHumanMattingDataset,
                                         MattingResize, MattingNormalize,
                                         HumanMattingCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_pfan_matting"
    input_image_size = 64

    model = MODELS.create(network)

    loss_list = ["GlobalTrimapCELoss", "GloabelTrimapIouLoss",
                 "LocalAlphaLoss", "LocalLaplacianLoss", "FusionAlphaLoss",
                 "FusionLaplacianLoss", "CompositionLoss"]
    criterion_cfg = {name: (1.0, LOSSES.create(name)) for name in loss_list}
    train_criterion = None

    train_dataset = FakeHumanMattingDataset(
        num_samples=32, image_hw=96,
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingNormalize()]))
    test_dataset = FakeHumanMattingDataset(
        num_samples=8, image_hw=96, seed=1,
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingNormalize()]))
    train_collater = HumanMattingCollater(resize=input_image_size)
    test_collater = HumanMattingCollater(resize=input_image_size)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
    epochs = 2
    print_interval = 2
    use_ema_model = False
