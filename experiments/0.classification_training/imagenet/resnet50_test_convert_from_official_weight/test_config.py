"""Official-weight verification ritual (parity: reference
0.classification_training/imagenet/
resnet50_test_convert_from_pytorch_official_weight — convert the torchvision
resnet50 checkpoint and verify its published top-1 (~76.1) reproduces):

  python tools/convert_official_weights.py --family torchvision_resnet \
      --network resnet50 --checkpoint resnet50-0676ba61.pth \
      --out ./converted_resnet50
  python tools/test_classification.py --work-dir ./

with trained_model_path pointing at the converted checkpoint."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import ILSVRC2012_path  # noqa: E402

from simpleaicv_tpu.core.registry import BACKBONES
from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
from simpleaicv_tpu.data.transforms import (Compose, Resize, CenterCrop,
                                            Normalize)
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "resnet50"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = "./converted_resnet50"

    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([Resize(resize=256),
                           CenterCrop(resize=input_image_size), Normalize()]))
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 256
    num_workers = 8
