"""Dataset-preparation subsystem: converts raw public-dataset downloads into
the standardized folder/json layouts the `simpleaicv_tpu.data.datasets`
readers consume (parity: the reference's per-task ``*_dataset_processing``
script directories — text_detection/text_detection_dataset_processing/,
text_recognition/{text_line_from_text_detection,text_recognition,char_table}
_dataset_processing/, face_parsing/ + human_parsing/ processing dirs, and
interactive_segmentation/interactive_segmentation_dataset_preprocessing/).

CLI entry point: ``tools/prepare_dataset.py``.
"""

from .common import (IGNORE_CHAR, normalize_text, half_angle,  # noqa: F401
                     resize_max_side, write_standard_set)
from .text_detection import (process_rctw, process_art,  # noqa: F401
                             process_lsvt, process_mlt, process_rects,
                             standardize_detection_set)
from .text_lines import (extract_text_lines, build_char_table)  # noqa: F401
from .parsing import (process_face_synthetics,  # noqa: F401
                      process_celebamask_hq, process_lip, process_cihp)
from .sam_labels import convert_mask_folder_to_sa1b  # noqa: F401
