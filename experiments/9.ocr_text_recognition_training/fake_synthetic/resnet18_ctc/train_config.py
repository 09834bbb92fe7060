"""Synthetic digit CTC smoke experiment."""

from simpleaicv_tpu.core.registry import LOSSES
from simpleaicv_tpu.data.text_recognition import (
    CTCTextLabelConverter, FakeTextRecognitionDataset,
    KeepRatioResizeTextRecognitionCollater)
from simpleaicv_tpu.models.text_recognition import CTCModel


class config:
    network = "CTCModel"
    input_image_size = 32

    converter = CTCTextLabelConverter(list("0123456789"), str_max_length=10)
    model = CTCModel(backbone_type="resnet18", encoder_type="BiLSTMEncoder",
                     predictor_hidden_planes=64,
                     num_classes=converter.num_classes)
    train_criterion = LOSSES.create("CTCLoss")

    train_dataset = FakeTextRecognitionDataset(64)
    test_dataset = FakeTextRecognitionDataset(16)
    train_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=32, max_w=256)
    test_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=32, max_w=256)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 3
    print_interval = 4
    use_ema_model = False
