import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import COCO2017_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS


class config:
    """SOLOv2 R50 1024 (parity: reference res50_solov2; target mask mAP
    37.807 @39ep). COCO instance masks load through CocoDetection-style
    json + polygon rasterization in the instance collater."""
    network = "resnet50_solov2"
    num_classes = 80
    input_image_size = 1024

    model = MODELS.create(network, num_classes=num_classes)
    train_criterion = LOSSES.create("SOLOV2Loss")
    decoder = DECODERS.create("SOLOV2Decoder")

    from simpleaicv_tpu.data.instance_segmentation import (
        InstanceSegmentationResize, InstanceRandomHorizontalFlip,
        InstanceNormalize, SOLOV2InstanceSegmentationCollater)
    from simpleaicv_tpu.data.transforms import Compose
    _transform = Compose([
        InstanceSegmentationResize(resize=input_image_size,
                                   resize_type="yolo_style",
                                   multi_scale=True),
        InstanceRandomHorizontalFlip(prob=0.5),
        InstanceNormalize(),
    ])
    from path import COCO2017_path
    from simpleaicv_tpu.data.datasets import CocoInstanceSegmentation
    train_dataset = CocoInstanceSegmentation(
        COCO2017_path, set_name="train2017", filter_no_object_image=True,
        transform=_transform)
    test_dataset = None
    train_collater = SOLOV2InstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")
    test_collater = None

    seed = 0
    batch_size = 16
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("MultiStepLR", {"warm_up_epochs": 0.5, "gamma": 0.1,
                                 "milestones": [24, 33]})
    epochs = 39
    print_interval = 100
    use_ema_model = False
