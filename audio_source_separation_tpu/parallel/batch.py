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


def _batched_spec(mesh, field, ndim, field_axes, tp_name="tp"):
    """``P('dp', …, 'tp', …)`` for a batched state field: 'dp' on the leading
    batch axis, 'tp' on the solver-declared bin axis (shifted by the batch
    axis), replicated otherwise."""
    axes = field_axes.get(field)
    idx = None if axes is None else axes.get("bins")
    spec = [None] * ndim
    spec[0] = "dp"
    if idx is not None and tp_name is not None and ndim > 1:
        spec[1 + (idx % (ndim - 1))] = tp_name
    return P(*spec)


def batch_separate(
    solver, inputs, iteration=100, mesh=None, state_kwargs=None, host=True
):
    """Separate a batch of mixtures with one compiled scan.

    Args:
        solver: any scan-mode solver instance (IVA/ILRMA/MNMF/... families).
        inputs: ``(batch, n_channels, n_bins, n_frames)`` complex (host).
        iteration: number of update steps.
        mesh: optional ``jax.sharding.Mesh`` with axes ``('dp', 'tp')`` — the
            batch axis shards over ``dp`` and the bin axis over ``tp``, with
            EXPLICIT in/out shardings on the inputs, warm-start state and
            outputs (the result stays distributed; GSPMD cannot silently
            gather it).
        state_kwargs: optional dict of warm-start arrays, each with a leading
            batch axis.
        host: fetch results to host NumPy (default); ``host=False`` returns
            the device arrays (outputs still packed as a ``Pair``) so callers
            can keep the pipeline on-device / inspect shardings.
    Returns:
        ``(outputs (batch, n_sources, n_bins, n_frames), losses (batch, iteration))``
        — losses is None when ``solver.recordable_loss`` is False.
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
        tp = "tp" if "tp" in mesh.axis_names else None
        field_axes = solver.field_axes()
        x_sharding = jax.tree.map(
            lambda leaf: NamedSharding(
                mesh, _batched_spec(mesh, "input", leaf.ndim, field_axes, tp)
            ),
            Xp,
        )
        kw_sharding = {
            k: jax.tree.map(
                lambda leaf: NamedSharding(
                    mesh, _batched_spec(mesh, k, leaf.ndim, field_axes, tp)
                ),
                v,
            )
            for k, v in kwargs_p.items()
        }
        out_sharding = jax.tree.map(
            lambda leaf: NamedSharding(
                mesh, _batched_spec(mesh, "estimation", leaf.ndim, field_axes, tp)
            ),
            Xp,
        )
        losses_sharding = NamedSharding(mesh, P("dp"))
        run = jax.jit(
            batched_run,
            in_shardings=(x_sharding, kw_sharding),
            out_shardings=(out_sharding, losses_sharding),
        )
    else:
        run = jax.jit(batched_run)

    outputs_p, losses = run(Xp, kwargs_p)
    if not host:
        return outputs_p, (losses if record else None)
    outputs = to_host(outputs_p)
    return outputs, (np.asarray(jax.device_get(losses)) if record else None)
