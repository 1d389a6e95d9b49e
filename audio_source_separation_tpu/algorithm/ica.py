"""Fixed-point ICA placeholder.

Parity target: reference ``src/algorithm/ica.py:5-7`` — a constructor-only
stub ("A Fast Fixed-Point Algorithm for Independent Component Analysis");
kept for API-surface parity.
"""

import numpy as np


class FixedPointICA:
    def __init__(self, n_channels=10, dtype=np.complex128):
        self.demix_filter = np.eye(n_channels, dtype=dtype)
