"""Backbone zoo. Factory-name parity with reference
simpleAICV/classification/backbones/__init__.py (module-__dict__ registry).
"""

from .resnet import *  # noqa: F401,F403
from .resnetforcifar import *  # noqa: F401,F403
from .vit import *  # noqa: F401,F403
from .vit_moe import *  # noqa: F401,F403
from .convformer import *  # noqa: F401,F403
from .van import *  # noqa: F401,F403
from .darknet import *  # noqa: F401,F403
