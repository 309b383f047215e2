"""Deterministic seeding (seed_everything parity, utils/misc.py:170-176)."""

import os
import random

import numpy as np


def seed_everything(seed: int) -> int:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
