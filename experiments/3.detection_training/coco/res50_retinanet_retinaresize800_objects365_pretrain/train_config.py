import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import COCO2017_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import CocoDetection
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    """RetinaNet R50 800 (parity: reference res50_retinanet; target mAP
    37.281)."""
    network = "resnet50_retinanet"
    num_classes = 80
    input_image_size = 800

    model = MODELS.create(network, num_classes=num_classes)
    train_criterion = LOSSES.create("RetinaLoss")
    decoder = DECODERS.create("RetinaDecoder")

    train_dataset = CocoDetection(
        COCO2017_path, set_name="train2017", filter_no_object_image=True,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="retina_style", multi_scale=True),
            RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = CocoDetection(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="retina_style"), Normalize()]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="retina_style")
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="retina_style")

    seed = 0
    batch_size = 32
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("MultiStepLR", {"warm_up_epochs": 0.5, "gamma": 0.1,
                                 "milestones": [8, 12]})
    epochs = 13
    print_interval = 100
    use_ema_model = False
