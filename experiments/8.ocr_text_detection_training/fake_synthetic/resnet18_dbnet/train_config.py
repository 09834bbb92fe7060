"""Synthetic DBNet smoke experiment with per-epoch polygon P/R/F1 eval."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.text_detection import (FakeTextDetectionDataset,
                                                TextDetectionCollater)


class config:
    network = "resnet18_dbnet"
    input_image_size = 128

    model = MODELS.create(network)
    train_criterion = LOSSES.create("DBNetLoss")

    train_dataset = FakeTextDetectionDataset(num_samples=16, image_hw=128)
    test_dataset = FakeTextDetectionDataset(num_samples=4, image_hw=128)
    train_collater = TextDetectionCollater(resize=input_image_size)
    test_collater = TextDetectionCollater(resize=input_image_size)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
    epochs = 1
    print_interval = 2
    use_ema_model = False
