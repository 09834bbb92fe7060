from .deeplabv3plus import *  # noqa: F401,F403
