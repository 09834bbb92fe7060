"""PFAN matting on the combined portrait-matting sets (parity: reference
7.human_matting_training/resnet50_pfan_matting/train_config.py — 832x832,
the seven-loss global/local/fusion stack, AdamW 1e-4 cosine, 100 epochs)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import human_matting_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets.combined_folder import HumanMattingDataset
from simpleaicv_tpu.data.matting import (MattingResize,
                                         MattingRandomHorizontalFlip,
                                         MattingNormalize,
                                         HumanMattingCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "convformerm36_pfan_matting"
    input_image_size = 832

    backbone_pretrained_path = ""  # optional .pth/orbax converted weights
    model = MODELS.create(network)

    loss_list = ["GlobalTrimapCELoss", "GloabelTrimapIouLoss",
                 "LocalAlphaLoss", "LocalLaplacianLoss", "FusionAlphaLoss",
                 "FusionLaplacianLoss", "CompositionLoss"]
    criterion_cfg = {name: (1.0, LOSSES.create(name)) for name in loss_list}
    train_criterion = None

    train_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["Deep_Automatic_Portrait_Matting",
                       "RealWorldPortrait636", "P3M10K"],
        set_type="train",
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingRandomHorizontalFlip(prob=0.5),
                           MattingNormalize()]))
    test_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["Deep_Automatic_Portrait_Matting", "P3M-500-NP",
                       "P3M-500-P"],
        set_type="val",
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingNormalize()]))
    train_collater = HumanMattingCollater(resize=input_image_size)
    test_collater = HumanMattingCollater(resize=input_image_size)

    seed = 0
    batch_size = 96
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 100
    print_interval = 50
    save_interval = 10
    use_ema_model = False

    mesh_data = -1   # all chips on the data axis
    mesh_fsdp = 1
