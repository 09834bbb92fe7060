"""ImageNet-21K ViT-B semantic-softmax pretraining (parity: reference
tools/train_imagenet21k_classification_model.py recipe — semantic-tree
hierarchy labels, AdamW, cosine)."""

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
    network = "vit_base_patch16"
    num_classes = 10450  # ImageNet-21K-P winter-21 class count
    input_image_size = 224

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""
    train_criterion = None  # built by the 21k trainer from the semantic tree

    train_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="train",
        transform=Compose([RandomResizedCrop(resize=input_image_size),
                           RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="val",
        transform=Compose([Resize(resize=256),
                           CenterCrop(resize=input_image_size),
                           Normalize()]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 1024
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 80
    print_interval = 100
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
