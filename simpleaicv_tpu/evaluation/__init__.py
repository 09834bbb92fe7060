from .coco_eval import evaluate_coco_detection_map  # noqa: F401
