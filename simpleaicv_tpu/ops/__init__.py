from .iou import iou_method  # noqa: F401
from .nms import batched_nms  # noqa: F401
