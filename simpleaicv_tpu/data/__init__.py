from .loader import DataLoader  # noqa: F401
from .collater import ClassificationCollater  # noqa: F401
from . import transforms  # noqa: F401
