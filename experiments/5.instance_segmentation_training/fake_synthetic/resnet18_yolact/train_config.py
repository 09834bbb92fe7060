"""Synthetic YOLACT smoke experiment with mask-mAP eval (mirrors reference
5.instance_segmentation_training/coco/res50_yolact_yoloresize1024)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.instance_segmentation import (
    FakeInstanceSegmentationDataset, InstanceSegmentationResize,
    InstanceNormalize, YOLACTInstanceSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_yolact"
    num_classes = 4
    input_image_size = 128

    # YOLACT class head includes background at index 0
    model = MODELS.create(network, num_classes=num_classes + 1)
    train_criterion = LOSSES.create("YOLACTLoss", resize=input_image_size)
    decoder = DECODERS.create("YOLACTDecoder", resize=input_image_size,
                              topn=50, max_object_num=20)

    _transform = Compose([
        InstanceSegmentationResize(resize=input_image_size,
                                   resize_type="yolo_style"),
        InstanceNormalize(),
    ])
    train_dataset = FakeInstanceSegmentationDataset(
        num_samples=16, image_hw=160, num_classes=num_classes,
        transform=_transform)
    test_dataset = FakeInstanceSegmentationDataset(
        num_samples=4, image_hw=160, num_classes=num_classes,
        transform=_transform)
    train_collater = YOLACTInstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")
    test_collater = YOLACTInstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
    epochs = 1
    print_interval = 2
    use_ema_model = False
