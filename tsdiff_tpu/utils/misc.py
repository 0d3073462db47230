"""Infra utilities: logging, seeding, log dirs (reference utils/misc.py)."""

from __future__ import annotations

import logging
import os
import random
import time

import numpy as np


class BlackHole:
    """Swallows everything (reference utils/misc.py:17-25) — used in place of
    loggers/writers when logging is disabled."""

    def __setattr__(self, name, value):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


def get_logger(name: str, log_dir: str | None = None) -> logging.Logger:
    """Console + optional file logger (reference utils/misc.py:28-44)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if logger.handlers:
        return logger
    formatter = logging.Formatter(
        "[%(asctime)s::%(name)s::%(levelname)s] %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    if log_dir is not None:
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def get_new_log_dir(root: str = "./logs", prefix: str = "", tag: str = "") -> str:
    """Timestamped run directory (reference utils/misc.py:47-57)."""
    fn = time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
    if prefix:
        fn = f"{prefix}_{fn}"
    if tag:
        fn = f"{fn}_{tag}"
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def seed_all(seed: int) -> None:
    """Seed python + numpy (reference utils/misc.py:60-63).  JAX randomness is
    explicitly key-threaded and derives from these via ``jax.random.key``."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
