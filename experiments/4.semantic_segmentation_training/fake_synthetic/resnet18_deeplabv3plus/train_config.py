"""Synthetic DeepLabV3+ smoke experiment."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.segmentation import (FakeSegmentationDataset,
                                              SegNormalize,
                                              SemanticSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_deeplabv3plus"
    num_classes = 6
    input_image_size = 64
    ignore_index = 255

    model = MODELS.create(network, num_classes=num_classes)
    train_criterion = LOSSES.create("SegCELoss", ignore_index=ignore_index)

    train_dataset = FakeSegmentationDataset(48, 64, num_classes,
                                            transform=Compose([SegNormalize()]))
    test_dataset = FakeSegmentationDataset(16, 64, num_classes,
                                           transform=Compose([SegNormalize()]))
    train_collater = SemanticSegmentationCollater(resize=64)
    test_collater = SemanticSegmentationCollater(resize=64)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("PolyLR", {"warm_up_epochs": 0, "power": 0.9})
    epochs = 2
    print_interval = 3
    use_ema_model = False
