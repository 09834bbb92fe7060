"""Logger setup (parity: reference get_logger, tools/utils.py:64-89).

Rotating file handler + stream handler, ``%(asctime)s - %(message)s`` format,
gated on JAX process index 0 (replacing the reference's rank-0 gating).
"""

from __future__ import annotations

import logging
import logging.handlers
import os

import jax


def get_logger(name: str, log_dir: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(message)s")

    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(log_dir, f"{name}.log"), when="W0", encoding="utf-8")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def info_on_host0(logger: logging.Logger, msg: str):
    if jax.process_index() == 0:
        logger.info(msg)
