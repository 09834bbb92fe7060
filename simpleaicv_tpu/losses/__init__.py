from .classification import (CELoss, FocalCELoss, LabelSmoothCELoss,
                             OneHotLabelCELoss, SemanticSoftmaxLoss)  # noqa: F401
from .distillation import KDLoss, DMLLoss, L2Loss  # noqa: F401
