"""Batched (data-parallel) separation.

The reference processes one mixture per process; the TPU-native framework adds
a batch axis (SURVEY.md §2.6): `batch_separate` vmaps any scan-mode solver's
functional core over a leading mixture axis and optionally shards the batch
(`dp`) and frequency-bin (`tp`) axes over a device mesh — throughput-oriented
separation of many mixtures in one compiled program.

Notes:
  * all mixtures in a batch share shapes and hyperparameters;
  * host-RNG default initializations are drawn independently per example
    (same reference draw order within each example);
  * callbacks are not supported in batched mode (use per-example solves).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.packing import pack, to_host, unpack


def batch_separate(solver, inputs, iteration=100, mesh=None, state_kwargs=None):
    """Separate a batch of mixtures with one compiled scan.

    Args:
        solver: any scan-mode solver instance (IVA/ILRMA/MNMF/... families).
        inputs: ``(batch, n_channels, n_bins, n_frames)`` complex (host).
        iteration: number of update steps.
        mesh: optional ``jax.sharding.Mesh`` with axes ``('dp', 'tp')`` — the
            batch axis shards over ``dp`` and the bin axis over ``tp``.
        state_kwargs: optional dict of warm-start arrays, each with a leading
            batch axis.
    Returns:
        ``(outputs (batch, n_sources, n_bins, n_frames), losses (batch, iteration))``
        — host NumPy; losses is None when ``solver.recordable_loss`` is False.
    """
    inputs = np.asarray(inputs)
    batch = inputs.shape[0]
    solver.set_shape_metadata(inputs[0])

    # per-example host-side default inits (reference RNG order per example)
    per_example_kwargs = []
    for b in range(batch):
        kw = {k: np.asarray(v[b]) for k, v in (state_kwargs or {}).items()}
        kw = solver.prepare_state_kwargs(inputs[b], kw)
        per_example_kwargs.append(kw)
    stacked_kwargs = {
        k: np.stack([kw[k] for kw in per_example_kwargs])
        for k in per_example_kwargs[0]
    }

    Xp = pack(inputs)
    kwargs_p = pack(stacked_kwargs)

    record = bool(solver.recordable_loss)

    def single_run(X, kw):
        state = solver.init_state(X, **kw)

        def body(s, _):
            s = solver.update_state(s)
            out = solver.nll(s) if record else jnp.zeros(())
            return s, out

        state, losses = jax.lax.scan(body, state, None, length=iteration)
        return solver.finalize(state), losses

    def batched_run(Xp, kwargs_p):
        X = unpack(Xp)
        kw = unpack(kwargs_p)
        outputs, losses = jax.vmap(single_run)(X, kw)
        return pack(outputs), losses

    if mesh is not None:
        x_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P("dp", None, "tp", None)), Xp
        )
        Xp = jax.device_put(Xp, x_sharding)
        run = jax.jit(batched_run)
    else:
        run = jax.jit(batched_run)

    outputs_p, losses = run(Xp, kwargs_p)
    outputs = to_host(outputs_p)
    return outputs, (np.asarray(jax.device_get(losses)) if record else None)
