from .anchor import RetinaAnchors, FCOSPositions  # noqa: F401
from .retinanet import *  # noqa: F401,F403
from .fcos import *  # noqa: F401,F403
from .decode import *  # noqa: F401,F403  (registers decoders)
from .detr import *  # noqa: F401,F403
from .detr_decode import *  # noqa: F401,F403
from .dinodetr import *  # noqa: F401,F403
from .dinodetr_decode import *  # noqa: F401,F403
