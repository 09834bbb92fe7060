from .cifar import CIFAR10Dataset, CIFAR100Dataset  # noqa: F401
from .synthetic import (FakeClassificationDataset,  # noqa: F401
                        LearnableClassificationDataset,
                        LearnableDetectionDataset, TwoModeImageDataset)
from .ilsvrc2012 import ILSVRC2012Dataset  # noqa: F401
from .coco import CocoDetection, FakeDetectionDataset  # noqa: F401
from .voc import VocDetection, evaluate_voc_detection  # noqa: F401
from .ade20k import ADE20KDataset  # noqa: F401
from .face_images import CelebAHQDataset, FFHQDataset  # noqa: F401
from .combined_folder import (SalientObjectDetectionDataset,
                              HumanMattingDataset, HumanParsingDataset,
                              FaceParsingDataset,
                              FaceDetectionDataset)  # noqa: F401
from .imagenet21k import (ImageNet21KSingleLabelDataset,
                          ImageNet21KSemanticTreeLabelDataset,
                          ImageNet21KSemanticCollater)  # noqa: F401
from .text import TextDetection, TextRecognition  # noqa: F401
from .sam_segmentation import SAMSegmentationDataset  # noqa: F401
from .more_datasets import (Objects365Detection, SamaCocoDetection, ACCV2022Dataset)  # noqa: F401
from .coco_instance import CocoInstanceSegmentation  # noqa: F401
from .coco_semantic import CocoSemanticSegmentation  # noqa: F401
