from .solov2 import *  # noqa: F401,F403
from .yolact import *  # noqa: F401,F403
from .decode import *  # noqa: F401,F403  (registers SOLOV2Decoder)
