"""Global logger (parity: reference utils/logger.py)."""
from __future__ import annotations

import logging
import sys

_FMT = '[%(asctime)s %(levelname)s %(name)s] %(message)s'


def set_logging(name: str = 'cartoonseg_tpu', level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FMT, datefmt='%H:%M:%S'))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


LOGGER = set_logging()
