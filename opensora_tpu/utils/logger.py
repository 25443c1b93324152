"""Process-0 logging (reference: opensora/utils/logger.py:40-90).

On TPU pods SPMD means every host runs the same program; only process 0
writes logs, mirroring the reference's rank-0 logger.
"""

from __future__ import annotations

import logging
import os
import sys


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def create_logger(exp_dir: str | None = None, name: str = "opensora_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    if is_main_process():
        fmt = logging.Formatter(
            "[%(asctime)s] %(levelname)s %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if exp_dir is not None:
            os.makedirs(exp_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        logger.propagate = False
    else:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
    return logger


def log_message(*args, level: str = "info", logger: logging.Logger | None = None):
    logger = logger or create_logger()
    getattr(logger, level)(" ".join(str(a) for a in args))
