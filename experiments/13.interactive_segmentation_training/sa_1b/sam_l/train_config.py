import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import interactive_segmentation_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import SAMSegmentationDataset
from simpleaicv_tpu.data.interactive_segmentation import (SamResize,
                                                          SAMBatchCollater)


class config:
    """SAM-B on SA-1B subsets (parity: reference
    13.interactive_segmentation_training)."""
    network = "sam_l"
    input_image_size = 1024

    model = MODELS.create(network, image_size=input_image_size,
                          use_gradient_checkpoint=True)
    train_criterion = LOSSES.create("SAMMultiLevelLoss")

    train_dataset = SAMSegmentationDataset(
        interactive_segmentation_dataset_path,
        set_name_list=["sa_000020"], set_type="train",
        transform=SamResize(input_image_size))
    test_dataset = None
    train_collater = SAMBatchCollater(resize=input_image_size)
    test_collater = None

    prompt_probs = {"point": 0.5, "box": 0.25, "mask": 0.25}
    decoder_point_iters = 2

    seed = 0
    batch_size = 4
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1})
    epochs = 100
    print_interval = 50
    use_ema_model = False
