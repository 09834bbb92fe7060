"""Synthetic KD distillation smoke (resnet34 teacher -> resnet18 student;
CPU/TPU-runnable without ImageNet)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "KDTeacherStudent"
    num_classes = 10
    input_image_size = 64

    model = MODELS.create(network, teacher_type="resnet34",
                          student_type="resnet18", num_classes=num_classes)
    teacher_model_path = ""
    trained_model_path = ""

    loss_list = [
        {"loss_name": "CELoss", "loss_ratio": 1.0},
        {"loss_name": "KDLoss", "loss_ratio": 1.0, "T": 1.0},
    ]
    train_criterion = None
    test_criterion = LOSSES.create("CELoss")

    train_dataset = FakeClassificationDataset(
        num_samples=128, image_hw=64, num_classes=num_classes)
    test_dataset = FakeClassificationDataset(
        num_samples=64, image_hw=64, num_classes=num_classes)
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 32
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("SGD", {"lr": 0.05, "momentum": 0.9,
                         "global_weight_decay": False, "weight_decay": 1e-4,
                         "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
