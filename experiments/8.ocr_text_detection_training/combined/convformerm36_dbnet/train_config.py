import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import text_detection_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import TextDetection
from simpleaicv_tpu.data.text_detection import (DBNetMapGenerator,
                                                TextDetectionCollater)


class config:
    """DBNet convformer-m36 1024 (parity: reference; target P/R/F1
    92.748/89.947/91.326)."""
    network = "convformerm36_dbnet"
    input_image_size = 1024

    model = MODELS.create(network)
    train_criterion = LOSSES.create("DBNetLoss")

    class _WithMaps:
        def __init__(self, ds):
            self.ds = ds
            self.gen = DBNetMapGenerator()

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.gen(self.ds[i])

    train_dataset = _WithMaps(TextDetection(
        text_detection_dataset_path,
        set_name_list=["RCTW", "ART", "LSVT", "MLT", "ReCTS"],
        set_type="train"))
    test_dataset = None
    train_collater = TextDetectionCollater(resize=input_image_size)
    test_collater = None

    seed = 0
    batch_size = 16
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("PolyLR", {"warm_up_epochs": 1, "power": 0.9})
    epochs = 100
    print_interval = 100
    use_ema_model = False
