"""General host utilities (parity: reference utils/general_utils.py:112-133
safe_state, utils/system_utils.py)."""
from __future__ import annotations

import os
import random
import sys
import time
from datetime import datetime

import numpy as np


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def elapsed(self):
        return time.time() - self.t0


def mkdir_p(folder_path):
    os.makedirs(folder_path, exist_ok=True)


def safe_state(silent: bool = False, seed: int = 0):
    """Seed RNGs and timestamp stdout lines (reference safe_state,
    general_utils.py:112-133; the cuda-device pin is replaced by JAX's
    default device handling)."""
    old_f = sys.stdout

    class F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    old_f.write(x.replace(
                        "\n", " [{}]\n".format(
                            datetime.now().strftime("%d/%m %H:%M:%S"))))
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F(silent)
    random.seed(seed)
    np.random.seed(seed)
