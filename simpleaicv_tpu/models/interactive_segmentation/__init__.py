from .sam import *  # noqa: F401,F403
