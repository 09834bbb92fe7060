"""CTC text recognition on the combined real OCR sets (parity: reference
9.ocr_text_recognition_training/convformerm36_ctc_model/train_config.py —
32-high keep-ratio canvases, AdamW 1e-4, 50 epochs, bs 512, 12k-char table).

Char set: the reference's EXACT 12,111-char ordering
(data/char_table.py reference_char_table) so the CTC head width and class
indices match reference checkpoints 1:1 (weight-convert compatible).
A ``<dataset_root>/char_table.txt`` (one char per line) overrides it; pass
"superset" for the dataset-independent generated table."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import text_recognition_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import LOSSES
from simpleaicv_tpu.data.char_table import reference_char_table
from simpleaicv_tpu.data.datasets.text import TextRecognition
from simpleaicv_tpu.data.text_recognition import (
    CTCTextLabelConverter, KeepRatioResizeTextRecognitionCollater)
from simpleaicv_tpu.models.text_recognition import CTCModel


def _load_char_table():
    path = os.path.join(text_recognition_dataset_path, "char_table.txt")
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return [line.rstrip("\n") for line in f if line.rstrip("\n")]
    return reference_char_table()


class config:
    network = "CTCModel"
    input_image_size = 32
    str_max_length = 80

    converter = CTCTextLabelConverter(_load_char_table(),
                                      str_max_length=str_max_length)
    model = CTCModel(backbone_type="convformer_m36",
                     encoder_type="TransformerEncoder",
                     num_classes=converter.num_classes)
    train_criterion = LOSSES.create("CTCLoss")

    _train_sets = ["aistudio_baidu_street", "chinese_dataset",
                   "synthetic_chinese_string_dataset_trainsubset"]
    _val_sets = ["aistudio_baidu_street"]
    train_dataset = TextRecognition(
        text_recognition_dataset_path, set_name_list=_train_sets,
        set_type="train")
    test_dataset = TextRecognition(
        text_recognition_dataset_path, set_name_list=_val_sets,
        set_type="val")
    train_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=input_image_size, max_w=512)
    test_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=input_image_size, max_w=512)

    seed = 0
    batch_size = 512
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 50
    print_interval = 100
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
