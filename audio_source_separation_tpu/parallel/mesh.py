"""Device-mesh helpers for multi-chip BSS.

The reference has no distributed code at all (single-process NumPy —
SURVEY.md §2.6).  The TPU-native scaling strategy:

  * **bin parallelism** (the tensor-parallel analogue): every per-bin C×C
    update (IP solves, covariance rows, separation matmuls) is independent
    across the ``n_bins`` axis, so the spectrogram / demixing-filter bin axis
    shards cleanly across devices with zero per-iteration collectives — only
    the scalar NLL reduction (a ``psum``) and the frame-weight computation
    (``R = f(Σ_bins |Y|²)``, an ``all-reduce`` over the bin axis) cross
    devices, riding the ICI;
  * **batch parallelism** (data parallel) over independent mixtures.

All sharding is expressed with ``jax.sharding.NamedSharding`` + ``jit``; XLA
inserts the collectives.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="bins", devices=None):
    """A 1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_spectrogram(X, mesh, axis_name="bins"):
    """Place ``X (n_channels, n_bins, n_frames)`` with the bin axis sharded.

    Pads the bin axis to a multiple of the mesh size if needed (F = fft//2+1
    is odd); padding bins are zero and harmless to every solver (their demix
    rows stay at the identity init).
    """
    n_devices = mesh.shape[axis_name]
    n_bins = X.shape[1]
    pad = (-n_bins) % n_devices
    if pad:
        X = jax.numpy.pad(X, ((0, 0), (0, pad), (0, 0)))
    sharding = NamedSharding(mesh, P(None, axis_name, None))
    return jax.device_put(X, sharding), n_bins
