"""Uniform padded block layout for block-diagonal frequency models (IPSDTA).

The reference partitions the ``n_bins`` axis into ``n_blocks`` blocks of
``n_neighbors = n_bins // n_blocks`` bins, with the last ``n_remains =
n_bins % n_blocks`` blocks one bin larger — and duplicates every update into
"low"/"high" code paths (``bss/ipsdta.py:269-299`` and throughout).  On TPU we
replace this with ONE uniform representation: all blocks padded to
``block_size = n_neighbors (+1 if n_remains)`` with a static validity mask.

Invariants used by the solvers:
  * block vectors (``y`` gathers) carry ZEROS in padded slots;
  * block matrices (basis ``U``) carry zeros in padded rows/columns;
  * before any inverse / eigh / logdet, an identity is injected into the
    padded diagonal (:func:`pad_identity`) so padded dimensions decouple and
    contribute ``log 1 = 0`` / identity inverses;
  * traces and quadratic forms then need no correction (padded parts are 0).
"""

import jax.numpy as jnp
import numpy as np


class BlockLayout:
    """Static description of the block partition of a bin axis."""

    def __init__(self, n_bins, n_blocks):
        n_neighbors = n_bins // n_blocks
        n_remains = n_bins % n_blocks
        self.n_bins = n_bins
        self.n_blocks = n_blocks
        self.n_neighbors = n_neighbors
        self.n_remains = n_remains
        self.block_size = n_neighbors + (1 if n_remains > 0 else 0)

        sizes = np.full(n_blocks, n_neighbors)
        sizes[n_blocks - n_remains :] += 1  # trailing blocks are larger
        self.sizes = sizes
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        self.starts = starts

        B = self.block_size
        idx = np.zeros((n_blocks, B), dtype=np.int64)
        valid = np.zeros((n_blocks, B), dtype=bool)
        for b in range(n_blocks):
            for j in range(sizes[b]):
                idx[b, j] = starts[b] + j
                valid[b, j] = True
        self.gather_index = jnp.asarray(idx)
        self.valid = jnp.asarray(valid)
        # flattened scatter: for each valid (b, j), the bin it owns
        flat_valid = valid.reshape(-1)
        self.scatter_src = jnp.asarray(np.nonzero(flat_valid)[0])

    # -------------------------------------------------------------- #
    def gather(self, x):
        """Gather the LAST axis (bins) into ``(..., n_blocks, block_size)``."""
        blocked = x[..., self.gather_index]
        return jnp.where(self.valid, blocked, jnp.zeros((), dtype=blocked.dtype))

    def scatter(self, blocked):
        """Inverse of :meth:`gather`: ``(..., n_blocks, block_size) → (..., n_bins)``."""
        flat = blocked.reshape(blocked.shape[:-2] + (-1,))
        return jnp.take(flat, self.scatter_src, axis=-1)

    def pad_identity(self, M, scale=1.0):
        """Inject ``scale·I`` into padded diagonal slots of block matrices
        ``M (..., n_blocks, B, B)``."""
        B = self.block_size
        pad_diag = (~self.valid).astype(M.real.dtype)  # (n_blocks, B)
        eye = jnp.eye(B, dtype=M.dtype)
        return M + scale * pad_diag[..., None] * eye

    def zero_padding_matrix(self, M):
        """Zero padded rows AND columns of ``M (..., n_blocks, B, B)``."""
        v = self.valid.astype(M.real.dtype)
        return M * v[..., :, None] * v[..., None, :]

    def mask_vector(self, x):
        """Zero padded slots of ``x (..., n_blocks, B)``."""
        return jnp.where(self.valid, x, jnp.zeros((), dtype=x.dtype))
