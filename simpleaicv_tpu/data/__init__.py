from .loader import DataLoader  # noqa: F401
from .collater import ClassificationCollater  # noqa: F401
from .packed import (PackedDataset, PackedLoader, PackReader,  # noqa: F401
                     PackWriter, pack_dataset, pack_image_folder)
from . import transforms  # noqa: F401
