"""Host environment knobs (reference utils/utils.set_multithreading/seeds)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_host_threads(n: int = 8) -> None:
    """Cap BLAS/OMP host threads (reference utils/utils.py:22-31)."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(n)


def set_seeds(seed: int = 0) -> None:
    """Host-side determinism (reference utils/utils.py:11-19).

    Device-side randomness is already explicit (jax PRNG keys threaded from
    config seeds); this pins the remaining host RNGs.
    """
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
