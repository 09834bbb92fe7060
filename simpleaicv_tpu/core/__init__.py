from . import registry, schedule, optim, ema, meters, logging_utils  # noqa: F401
