"""Synthetic classification smoke experiment (runs on CPU mesh or a single
TPU chip without ImageNet on disk)."""

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "resnet18"
    num_classes = 10
    input_image_size = 64

    model = BACKBONES.create(network, num_classes=num_classes)
    train_criterion = LOSSES.create("CELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = FakeClassificationDataset(
        num_samples=512, image_hw=64, num_classes=num_classes)
    test_dataset = FakeClassificationDataset(
        num_samples=128, image_hw=64, num_classes=num_classes)
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 64
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("SGD", {"lr": 0.05, "momentum": 0.9,
                         "global_weight_decay": False, "weight_decay": 1e-4,
                         "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-5})
    epochs = 5
    print_interval = 4
    use_ema_model = True  # covers the donating train step + EMA aliasing path
