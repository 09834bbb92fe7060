"""Dataset root paths (parity: reference tools/path.py:1-50 — centralised
dataset path constants). Edit for your machine; experiment configs import
from here."""

import os

_DATA_ROOT = os.environ.get("SIMPLEAICV_DATA_ROOT", "/root/datasets")

CIFAR10_path = os.path.join(_DATA_ROOT, "CIFAR10")
CIFAR100_path = os.path.join(_DATA_ROOT, "CIFAR100")
ILSVRC2012_path = os.path.join(_DATA_ROOT, "ILSVRC2012")
ImageNet21K_path = os.path.join(_DATA_ROOT, "ImageNet21K")
ACCV2022_path = os.path.join(_DATA_ROOT, "ACCV2022")

COCO2017_path = os.path.join(_DATA_ROOT, "COCO2017")
SAMACOCO_path = os.path.join(_DATA_ROOT, "SAMA-COCO")
Objects365_path = os.path.join(_DATA_ROOT, "objects365_2020")
VOCdataset_path = os.path.join(_DATA_ROOT, "VOCdataset")

ADE20Kdataset_path = os.path.join(_DATA_ROOT, "ADE20K")
COCO2017_semantic_path = COCO2017_path

salient_object_detection_dataset_path = os.path.join(
    _DATA_ROOT, "salient_object_detection_dataset")
human_matting_dataset_path = os.path.join(_DATA_ROOT,
                                          "human_matting_dataset")

text_detection_dataset_path = os.path.join(_DATA_ROOT,
                                           "text_detection_dataset")
text_recognition_dataset_path = os.path.join(_DATA_ROOT,
                                             "text_recognition_dataset")

face_detection_dataset_path = os.path.join(_DATA_ROOT,
                                           "face_detection_dataset")
face_parsing_dataset_path = os.path.join(_DATA_ROOT,
                                         "face_parsing_dataset")
human_parsing_dataset_path = os.path.join(_DATA_ROOT,
                                          "human_parsing_dataset")

interactive_segmentation_dataset_path = os.path.join(
    _DATA_ROOT, "interactive_segmentation_dataset")

CelebAHQ_path = os.path.join(_DATA_ROOT, "CelebA-HQ")
FFHQ_path = os.path.join(_DATA_ROOT, "FFHQ")
