"""Synthetic classification smoke with the ON-DEVICE augmentation pipeline
(data/device_augment.py): AutoAugment + normalize + random erasing +
mixup/cutmix all run inside the jitted train step — host workers only
produce raw [0,255] batches.  Exercises the engine ``augment_fn`` hook
end-to-end through the real CLI."""

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.collater import ClassificationCollater
from simpleaicv_tpu.data.device_augment import (DeviceAugmentPipeline,
                                                DeviceAutoAugment,
                                                DeviceMixupCutmix,
                                                DeviceRandomErasing)


class config:
    network = "resnet18"
    num_classes = 10
    input_image_size = 64

    model = BACKBONES.create(network, num_classes=num_classes)
    # device mixup/cutmix produces soft one-hot labels
    train_criterion = LOSSES.create("OneHotLabelCELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = FakeClassificationDataset(
        num_samples=512, image_hw=64, num_classes=num_classes)
    test_dataset = FakeClassificationDataset(
        num_samples=128, image_hw=64, num_classes=num_classes)
    # uint8 transport: raw batches cross the worker pipe at 1/4 the
    # float32 bytes; the device pipeline casts to f32 on chip
    train_collater = ClassificationCollater(image_dtype="uint8")
    test_collater = ClassificationCollater()

    device_augment = DeviceAugmentPipeline(
        augment=DeviceAutoAugment("v0"),
        erasing=DeviceRandomErasing(prob=0.25),
        mixupcutmix=DeviceMixupCutmix(
            use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
            label_smoothing=0.1, num_classes=num_classes))

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
    use_ema_model = False
