"""Support utilities: config merging, logging, seeding, timers."""

import logging
import random
import time
from typing import Optional

import numpy as np

from .params import assign_params_dict, load_yaml, save_yaml, split_params


def set_all_seed(seed: int = 1024) -> None:
    """Seed python + numpy (parity: utils.set_all_seed utils.py:293).

    JAX randomness is explicit (PRNGKey), so nothing global to seed there.
    """
    random.seed(seed)
    np.random.seed(seed)


def init_logger(name: str = "asv_subtools_tpu", level: int = logging.INFO):
    """Stdout logger with the reference's formatter shape (launchers :83-91)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s [ %(pathname)s:%(lineno)s - %(funcName)s ] "
                "%(levelname)s %(message)s"
            )
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


class Timer:
    """Context/manual timer (parity: utils.Timer utils.py:606-613)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()

    def elapse(self) -> float:
        return time.perf_counter() - self._start

    def __enter__(self):
        self.reset()
        return self

    def __exit__(self, *a):
        self.elapsed = self.elapse()


def auto_scale_lr(base_lr: float, world_size: int, base_world: int = 1) -> float:
    """Linear LR scaling with data-parallel width (utils.py:438-445)."""
    return base_lr * world_size / base_world
