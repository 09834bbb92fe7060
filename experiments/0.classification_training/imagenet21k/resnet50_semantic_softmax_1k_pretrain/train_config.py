"""[21k semantic-softmax from the 1K checkpoint — parity: reference imagenet21k/resnet50_semantic_softmax_1k_pretrain]
ImageNet-21K resnet50 semantic-softmax pretraining (parity: reference
0.classification_training/imagenet21k — 80 epochs; target semantic acc
75.319 per results.md:155-162)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import ImageNet21K_path  # noqa: E402

from simpleaicv_tpu.core.registry import BACKBONES
from simpleaicv_tpu.data.datasets.imagenet21k import (
    ImageNet21KSemanticTreeLabelDataset)
from simpleaicv_tpu.data.transforms import (Compose, RandomResizedCrop,
                                            RandomHorizontalFlip, Resize,
                                            CenterCrop, Normalize)
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "resnet50"
    num_classes = 10450
    input_image_size = 224

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""  # 1k-pretrained checkpoint
    train_criterion = None  # built by the 21k trainer from the semantic tree

    train_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="train",
        transform=Compose([RandomResizedCrop(resize=input_image_size),
                           RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="val",
        transform=Compose([Resize(resize=256),
                           CenterCrop(resize=input_image_size), Normalize()]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 1024
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-3, "global_weight_decay": True,
                           "weight_decay": 0.05,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 5})
    epochs = 80
    print_interval = 100
    use_ema_model = False
