from .classification import (CELoss, FocalCELoss, LabelSmoothCELoss,
                             OneHotLabelCELoss, SemanticSoftmaxLoss)  # noqa: F401
from .distillation import KDLoss, DMLLoss, L2Loss  # noqa: F401
from .detection import RetinaLoss, FCOSLoss  # noqa: F401
from .mae import MAEMSELoss, MAEL1Loss  # noqa: F401
from .segmentation import (SegCELoss, SegMultiClassBCELoss, SegIoULoss,
                           SegDiceLoss, SegLovaszLoss)  # noqa: F401
from .binary_segmentation import (BinaryBCELoss, OHEMBCELoss, BCEIouloss,
                                  BCEDiceLoss)  # noqa: F401
from .matting import (GlobalTrimapCELoss, GloabelTrimapIouLoss,
                      LocalAlphaLoss, LocalLaplacianLoss, FusionAlphaLoss,
                      FusionLaplacianLoss, CompositionLoss)  # noqa: F401
from .text_detection import DBNetLoss  # noqa: F401
from .text_recognition import CTCLoss, ACELoss  # noqa: F401
from .sam_matting import (SAMMattingOneLevelLoss, SAMMattingMultiLevelLoss,
                          SAMMattingMultiLevelIoUMaxLoss,
                          SAMMattingMultiLevelAssignLoss)  # noqa: F401
from .interactive_segmentation import (SAMMultiLevelLoss,
                                       SAMMultiLevelIoUMaxLoss,
                                       SAMDistillMSELoss,
                                       SAMDistillLoss)  # noqa: F401
from .instance_segmentation import SOLOV2Loss  # noqa: F401
from .yolact import YOLACTLoss  # noqa: F401
from .detr import DETRLoss  # noqa: F401
from .dinodetr import DINODETRLoss  # noqa: F401
