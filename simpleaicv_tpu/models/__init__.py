from . import backbones  # noqa: F401
from . import detection  # noqa: F401
from . import segmentation  # noqa: F401
from . import distillmodel  # noqa: F401
from . import vit_mae  # noqa: F401
