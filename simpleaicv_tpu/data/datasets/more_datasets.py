"""Remaining dataset aliases (parity: reference dataset inventory §2.3):
Objects365 and SAMA-COCO reuse the COCO json layout
(simpleAICV/detection/datasets/objects365dataset.py / samacocodataset.py);
ACCV2022 is a folder single-label classification set
(simpleAICV/classification/datasets/accv2022dataset.py)."""

from .coco import CocoDetection
from .imagenet21k import ImageNet21KSingleLabelDataset


class Objects365Detection(CocoDetection):
    """objects365_2020 json layout == COCO instances json."""


class SamaCocoDetection(CocoDetection):
    """SAMA-COCO relabelled masks; detection boxes share the COCO layout."""


class ACCV2022Dataset(ImageNet21KSingleLabelDataset):
    """ACCV2022 webly-supervised classification: folder-per-class."""
