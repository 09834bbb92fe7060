from .classification import (CELoss, FocalCELoss, LabelSmoothCELoss,
                             OneHotLabelCELoss, SemanticSoftmaxLoss)  # noqa: F401
from .distillation import KDLoss, DMLLoss, L2Loss  # noqa: F401
from .detection import RetinaLoss, FCOSLoss  # noqa: F401
from .mae import MAEMSELoss, MAEL1Loss  # noqa: F401
from .segmentation import (SegCELoss, SegMultiClassBCELoss, SegIoULoss,
                           SegDiceLoss, SegLovaszLoss)  # noqa: F401
