import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import ILSVRC2012_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
from simpleaicv_tpu.data.transforms import (Compose, RandomResizedCrop,
                                            RandomHorizontalFlip, Resize,
                                            CenterCrop, Normalize)
from simpleaicv_tpu.data.auto_rand_augment import RandAugment
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    """R152 + R50 deep mutual learning (parity: reference
    1.distillation_training/imagenet/resnet_152_dml_50/train_config.py —
    CE on both nets + bidirectional KL)."""
    network = "KDTeacherStudent"
    num_classes = 1000
    input_image_size = 224

    model = MODELS.create(network, teacher_type="resnet152",
                          student_type="resnet50", num_classes=num_classes)
    teacher_model_path = ""
    freeze_teacher = False  # DML trains both networks
    trained_model_path = ""

    loss_list = [
        {"loss_name": "CELoss", "loss_ratio": 1.0},
        {"loss_name": "DMLLoss", "loss_ratio": 1.0},
    ]
    train_criterion = None
    test_criterion = LOSSES.create("CELoss")

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([RandomResizedCrop(resize=input_image_size),
                           RandomHorizontalFlip(prob=0.5),
            RandAugment(N=2, M=9), Normalize()]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([Resize(resize=256),
                           CenterCrop(resize=input_image_size), Normalize()]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 256
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("SGD", {"lr": 0.1, "momentum": 0.9,
                         "global_weight_decay": False, "weight_decay": 1e-4,
                         "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 5})
    epochs = 300
    print_interval = 100
    use_ema_model = False
