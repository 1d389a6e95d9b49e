"""The solver runtime: one iteration engine for every separation model.

The reference re-implements the same ``__call__ / _reset / update_once /
separate / compute_negative_loglikelihood`` protocol in seven unrelated base
classes (``IVAbase`` ``bss/iva.py:22``, ``ILRMAbase`` ``bss/ilrma.py:22``,
``FDICAbase`` ``bss/fdica.py:8``, ``MultichannelNMFbase`` ``bss/mnmf.py:25``,
``IPSDTAbase`` ``bss/ipsdta.py:22``, ``IDLMAbase`` ``sss/idlma.py:10``,
``PDSBSSbase`` ``bss/prox.py:13``).  Here it exists once, TPU-first:

  * a solver defines pure functions over an explicit **state pytree**:
    ``init_state``, ``update_state``, ``nll`` and ``finalize``;
  * the iteration loop is a single ``jax.lax.scan`` jitted once per
    (shape, iteration-count) signature — per-iteration losses come out as a
    scan output, no host round-trips inside the loop;
  * every jit boundary is real-valued: complex state crosses as
    :class:`~audio_source_separation_tpu.ops.packing.Pair` nodes (the TPU
    runtime does not support complex buffers at the executable boundary;
    complex math inside the program is fully supported);
  * the reference's public API is preserved: ``solver = Cls(**hyper);
    output = solver(X, iteration=N, **state_kwargs)``, where ``state_kwargs``
    warm-start state arrays (the reference's kwargs-injected checkpoint/resume
    mechanism, ``bss/iva.py:39-58``) and any extra kwargs become plain
    attributes consumed by callbacks;
  * callbacks (the reference's only observability mechanism,
    ``bss/iva.py:76-89``) are supported by switching to a Python-level loop
    over the jitted single step, mirroring state into host NumPy instance
    attributes after every iteration exactly like the reference does.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packing import pack, realify, to_host, unpack

EPS = 1e-12


class IterativeSolver:
    """Base class implementing the universal solver protocol.

    Subclasses define:
      * ``state_fields``: tuple of state-pytree keys that may be warm-started
        via ``__call__`` kwargs;
      * ``init_state(X, **kwargs) -> dict`` (pure; runs inside jit);
      * ``update_state(state) -> state`` (pure; hyperparameters read from
        ``self`` are trace-time constants);
      * ``nll(state) -> real scalar``;
      * ``finalize(state) -> output`` (pure; separation + scale restoration);
      * optionally ``prepare_state_kwargs(input, state_kwargs)`` — host-side
        hook to materialize random/host-only default initializations (NumPy,
        reference seeding convention) before they are shipped to the device.
    """

    state_fields = ()
    # the IVA/ILRMA families record the NLL before the first update as well
    # (``bss/iva.py:72-74``); the NMF families record only post-update losses
    # (``algorithm/nmf.py:44-52``) — subclasses override this flag.
    record_initial_loss = True
    # the PDS solvers invoke callbacks only after iterations (``prox.py:95-102``)
    callback_on_init = True
    # state keys that update_state never changes: they are threaded into the
    # scan body as closed-over tracers instead of scan carries, so the while
    # loop never copies them per iteration (the mixture + precomputed
    # pair-product planes alone are ~30 MB at the canonical config)
    invariant_fields = ("input",)
    # state keys that are pure functions of the REST of the state (e.g. the
    # ``estimation == separate(input, W)`` invariant): the scan drops them
    # from the carry and re-derives them via :meth:`restore_state` at the
    # body head and once after the loop.  Carrying them is not just wasted
    # copies — a large carried array whose layout is pinned by the scan
    # OUTPUT pessimizes the whole loop body (measured 2.8× on AuxIVA-IP:
    # 3.6k → 10.3k iters/s by carrying only the demixing rows).
    derived_fields = ()

    def scan_derived_fields(self):
        """Per-configuration derived keys (subclasses may depend on mode)."""
        return self.derived_fields

    def restore_state(self, state):
        """Reconstruct derived fields dropped from the scan carry."""
        return state

    def scan_restore_state(self, state):
        """Body-head variant of :meth:`restore_state`.  Subclasses may
        restore a CHEAPER sufficient statistic than the full derived field
        when every in-scan consumer only needs it (e.g. the ILRMA family's
        ``estimation_power = |separate(X, W)|²`` computed as an all-real
        quadratic form over the pair-product planes, skipping the complex
        ``(N, F, T)`` materialization entirely — see
        ``ops/ip_components.py::quadratic_power_planes``).  The post-scan
        restore always uses :meth:`restore_state`, so published state and
        ``finalize`` still see the full derived fields."""
        return self.restore_state(state)

    def __init__(self, callbacks=None, recordable_loss=True, eps=EPS):
        if callbacks is not None and callable(callbacks):
            callbacks = [callbacks]
        self.callbacks = callbacks
        self.eps = eps
        self.input = None
        self.recordable_loss = recordable_loss
        self.loss = [] if recordable_loss else None
        self._jit_cache = {}
        self._mesh = None
        self._shard_mode = "bins"
        self._shard_axis_name = None
        self._shard_pad = False
        self._bin_pad = 0

    # ------------------------------------------------------------------ #
    # multi-chip execution (mesh-aware runtime)
    # ------------------------------------------------------------------ #
    def field_axes(self):
        """Per-state-field shardable axes:
        ``{field: {"bins": axis_index, "frames": axis_index}}`` (either key
        may be absent → the field is replicated in that mode).  Subclasses
        override; unknown fields replicate.  Negative indices allowed."""
        return {}

    def use_mesh(self, mesh, mode="bins", axis_name=None, pad_bins=False):
        """Run every jitted stage (init / scan / nll / finalize) under
        ``mesh`` with explicit in/out shardings on the whole state pytree.

        ``mode='bins'`` shards the frequency-bin axis (tensor parallel: every
        per-bin C×C update is independent; the only collectives are the
        cross-bin weight/NLL reductions, which GSPMD lowers to all-reduces
        over ICI).  ``mode='frames'`` shards the frame axis (the
        sequence-parallel analogue, SURVEY §2.6: covariance accumulations
        ``Σ_t`` become psum over frame shards).  ``mesh=None`` resets to
        single-device execution.

        The sharded axis length must be divisible by the mesh axis size (XLA
        shards evenly): pick a mesh that divides the bin/frame count
        (F = 2049 = 3·683 shards over 3 devices; T = 469 = 7·67 over 7), size
        the STFT so a power-of-two mesh divides it, or — for solvers whose
        updates are provably zero-bin neutral
        (:meth:`supports_bin_padding`) — pass ``pad_bins=True`` to zero-pad
        the bin axis up to the next multiple of the mesh axis.  Padded bins
        carry zero data and identity demixing rows, never couple into the
        valid bins (cross-bin reductions are sums over zero contributions,
        and the ill-conditioning guard keeps padded rows fixed), and are
        cropped from the output; recorded losses are exact for the AuxIVA
        family and offset by an iteration-independent constant (the floored
        ``log R`` of padded bins) for ILRMA.  Other indivisible combinations
        raise with a clear message at ``__call__`` time.
        """
        if mode not in ("bins", "frames"):
            raise ValueError("mode must be 'bins' or 'frames', got {!r}".format(mode))
        self._mesh = mesh
        self._shard_mode = mode
        self._shard_pad = bool(pad_bins)
        if mesh is not None and axis_name is None:
            axis_name = "tp" if "tp" in mesh.axis_names else mesh.axis_names[-1]
        self._shard_axis_name = axis_name
        self._jit_cache = {}  # shardings are part of the compiled signature
        return self

    def _validate_mesh(self, input):
        """Solver-specific mesh-compatibility hook, called at ``__call__``
        once the generic divisibility check passed.  Subclasses whose state
        couples the sharded axis beyond per-element independence (e.g.
        IPSDTA's block partition of the bin axis) raise here when the
        partition does not align with the shards."""

    # ------------------------------------------------------------------ #
    # bin padding (indivisible F under a bins-sharded mesh)
    # ------------------------------------------------------------------ #
    def supports_bin_padding(self):
        """Whether zero bins are provably neutral for this solver's updates
        (zero data + identity demix rows stay fixed and contribute nothing to
        cross-bin reductions).  Subclasses opt in per configuration."""
        return False

    def pad_state_kwarg(self, field, value, pad, axis):
        """Pad a warm-started state array along its bin axis (zeros by
        default; solvers override for fields with a different neutral fill,
        e.g. identity demixing rows)."""
        widths = [(0, 0)] * value.ndim
        widths[axis] = (0, pad)
        return np.pad(value, widths)

    def _covariance_flatten(self):
        """Whether the pair-product covariance may merge (planes, bins) into
        one GEMM dimension — merging a sharded bin axis into a flat dim
        defeats GSPMD propagation (forces an all-gather), so the bins-sharded
        path keeps the axes separate (see ops/ip_components.py)."""
        return not (
            getattr(self, "_mesh", None) is not None
            and self._shard_mode == "bins"
        )

    def _leaf_spec(self, field, ndim):
        from jax.sharding import PartitionSpec

        axes = self.field_axes().get(field)
        idx = None if axes is None else axes.get(self._shard_mode)
        if idx is None or ndim == 0:
            return PartitionSpec()
        idx = idx % ndim
        return PartitionSpec(*([None] * idx + [self._shard_axis_name]))

    def _sharding_tree(self, packed_tree):
        """``NamedSharding`` tree matching a packed pytree (dict of arrays /
        Pair nodes / ShapeDtypeStructs) keyed by state-field names."""
        from jax.sharding import NamedSharding

        mesh = self._mesh
        return {
            k: jax.tree.map(
                lambda leaf: NamedSharding(mesh, self._leaf_spec(k, leaf.ndim)), v
            )
            for k, v in packed_tree.items()
        }

    def _replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self._mesh, PartitionSpec())

    # ------------------------------------------------------------------ #
    # functional API — override in subclasses
    # ------------------------------------------------------------------ #
    def init_state(self, X, **kwargs):
        raise NotImplementedError

    def update_state(self, state):
        raise NotImplementedError

    def nll(self, state):
        raise NotImplementedError

    def finalize(self, state):
        raise NotImplementedError

    def prepare_state_kwargs(self, input, state_kwargs):
        """Host-side hook: fill in defaults that need host RNG (NumPy)."""
        return state_kwargs

    def set_shape_metadata(self, input):
        """Host-side shape bookkeeping (kept correct across jit cache hits)."""
        if input.ndim == 3:
            n_channels, n_bins, n_frames = input.shape
            self.n_channels = n_channels
            if getattr(self, "n_sources", None) is None:
                self.n_sources = n_channels
            self.n_bins, self.n_frames = n_bins, n_frames

    # ------------------------------------------------------------------ #
    # runtime
    # ------------------------------------------------------------------ #
    def _get_jit(self, name, fn_factory, in_shardings=None, out_shardings=None):
        # the pad count is a trace-time constant (true-bin-count denominators,
        # see pad_bins): two calls with the same padded shapes but different
        # true F must not share a compiled program
        name = "pad{}:{}".format(self._bin_pad, name)
        if name not in self._jit_cache:
            kwargs = {}
            if in_shardings is not None:
                kwargs["in_shardings"] = in_shardings
            if out_shardings is not None:
                kwargs["out_shardings"] = out_shardings
            self._jit_cache[name] = jax.jit(fn_factory(), **kwargs)
        return self._jit_cache[name]

    def _init_fn(self):
        def init(Xp, kwargs_p):
            return pack(self.init_state(unpack(Xp), **unpack(kwargs_p)))

        return init

    def _step_fn(self):
        return realify(self.update_state)

    def _nll_fn(self):
        def nll(sp):
            return self.nll(unpack(sp))

        return nll

    def _finalize_fn(self):
        return realify(self.finalize)

    # Whether derived fields ride INSIDE the scan carry (updated by
    # update_state like the raw kernels do) while staying OUT of the scan
    # result, which is re-derived from the true state at the epilogue.  The
    # round-2 pessimization ("full-state-out scan 3.6k vs 7.5k iters/s")
    # came from a carried array that ALSO fed the scan output — its layout
    # was pinned by the epilogue.  Dropping it from the RESULT (not from the
    # carry) keeps XLA free to keep the estimates VMEM-resident across
    # iterations while the body skips the per-iteration re-derivation.
    # MEASURED (round 3, AuxIVA-IP canonical): carrying alone is neutral
    # (0.96×); carrying PLUS the layout-anchoring scan probe below is 3.0×
    # (7.8k → 23.8k iters/s).  Subclasses opt in per measurement.
    derived_in_carry = False

    def scan_probe(self, state):
        """Optional cheap LIVE scalar emitted as the scan's per-iteration
        output when loss recording is off (``None`` → emit zeros).

        Measured TPU pathology (round 3, bisection on AuxIVA-IP at the
        canonical config): with Pair inputs and no live per-iteration scan
        output, XLA assigns the carried estimation a catastrophic layout —
        the same program runs 7.8k iters/s without a live output and 23.8k
        with ONE extra full reduction of the estimates per iteration.  The
        probe is that reduction: it anchors the carry layout and costs one
        (already traffic-resident) 15 MB read.  Only meaningful together
        with :attr:`derived_in_carry` (the estimates must be carried for
        their layout to be at stake)."""
        if not self.derived_in_carry:
            return None
        Y = state.get("estimation")
        if Y is None:
            return None
        return jnp.sum(jnp.abs(Y) ** 2)

    def _scan_fn(self, iteration, record_loss):
        def run(sp):
            state = unpack(sp)
            inv = {
                k: state[k] for k in self.invariant_fields if k in state
            }
            derived = tuple(
                k for k in self.scan_derived_fields() if k in state
            )
            carried_derived = self.derived_in_carry
            var = {
                k: v
                for k, v in state.items()
                if k not in inv and (carried_derived or k not in derived)
            }
            var_keys = tuple(var)

            def body(s, _):
                full = dict(inv, **s)
                if not carried_derived:
                    full = self.scan_restore_state(full)
                full = self.update_state(full)
                # contract check (trace-time only): declared-invariant fields
                # are closed over the body, NOT carried — if update_state
                # returned a new value for one, that change would be silently
                # discarded every iteration.  dict(state, ...)-style updates
                # preserve object identity for untouched entries, so identity
                # is the cheap structural test.
                for k in inv:
                    if k in full and full[k] is not inv[k]:
                        raise ValueError(
                            "update_state returned a new value for invariant "
                            "field {!r}; remove it from invariant_fields (it "
                            "would be dropped from the scan carry)".format(k)
                        )
                if record_loss:
                    out = self.nll(full)
                else:
                    probe = self.scan_probe(full)
                    out = jnp.zeros(()) if probe is None else probe
                return {k: full[k] for k in var_keys}, out

            var, losses = jax.lax.scan(body, var, None, length=iteration)
            # derived fields never reach the scan RESULT: re-derive them from
            # the true state so their carry layout is not output-pinned
            true_state = {k: v for k, v in var.items() if k not in derived}
            return pack(self.restore_state(dict(inv, **true_state))), losses

        return run

    def _sync_attributes(self, state_packed):
        host_state = to_host(state_packed)
        if getattr(self, "_bin_pad", 0):
            # published attributes must match the INPUT geometry, not the
            # padded device shapes: crop every bin-axis field back to the
            # true bin count (use_mesh pad_bins)
            axes = self.field_axes()
            n_true = self._n_bins_true
            for k, v in host_state.items():
                ax = (axes.get(k) or {}).get("bins")
                if ax is None or not hasattr(v, "ndim"):
                    continue
                idx = [slice(None)] * v.ndim
                idx[ax % v.ndim] = slice(0, n_true)
                host_state[k] = v[tuple(idx)]
        for k, v in host_state.items():
            setattr(self, k, v)
        return host_state

    def _split_kwargs(self, kwargs):
        state_kwargs, extra = {}, {}
        for k, v in kwargs.items():
            if k in self.state_fields:
                state_kwargs[k] = v
            else:
                extra[k] = v
        return state_kwargs, extra

    def __call__(self, input, iteration=100, **kwargs):
        """Run ``iteration`` update steps and return the separated output.

        Args:
            input: ``(n_channels, n_bins, n_frames)`` complex spectrogram
                (host NumPy or device array).
        Returns:
            ``(n_sources, n_bins, n_frames)`` complex estimates (host NumPy).
        """
        input = np.asarray(input)
        self.input = input

        state_kwargs, extra = self._split_kwargs(kwargs)
        for k, v in extra.items():
            setattr(self, k, v)

        self.set_shape_metadata(input)
        state_kwargs = self.prepare_state_kwargs(input, state_kwargs)

        # bin padding: host inits above used the TRUE bin count; pad the
        # input and every bins-axis state array up to the mesh multiple
        mesh = getattr(self, "_mesh", None)
        self._bin_pad = 0
        n_bins_true = input.shape[1] if input.ndim == 3 else None
        self._n_bins_true = n_bins_true
        if (
            mesh is not None
            and self._shard_mode == "bins"
            and input.ndim == 3
            and input.shape[1] % mesh.shape[self._shard_axis_name] != 0
            and self._shard_pad
        ):
            if not self.supports_bin_padding():
                raise ValueError(
                    "use_mesh(pad_bins=True): {} does not support zero-bin "
                    "padding in this configuration (padded bins must be "
                    "provably neutral); choose a mesh that divides n_bins "
                    "or size the STFT so one does".format(type(self).__name__)
                )
            pad = (-input.shape[1]) % mesh.shape[self._shard_axis_name]
            self._bin_pad = pad
            input = np.pad(input, ((0, 0), (0, pad), (0, 0)))
            axes = self.field_axes()
            for k in list(state_kwargs):
                v = state_kwargs[k]
                ax = (axes.get(k) or {}).get("bins")
                if v is None or ax is None:
                    continue
                v = np.asarray(v)
                state_kwargs[k] = self.pad_state_kwarg(k, v, pad, ax % v.ndim)

        Xp = pack(input)
        kwargs_p = pack(
            {k: np.asarray(v) for k, v in state_kwargs.items() if v is not None}
        )

        # mesh-aware runtime: every jit stage carries explicit in/out
        # shardings on the state pytree (see use_mesh)
        state_sh = scalar_sh = None
        if mesh is not None:
            axis_size = mesh.shape[self._shard_axis_name]
            # locate the sharded input axis from field_axes (3-D mixtures
            # shard (C, F, T) on axis 1/2; 2-D NMF targets on axis 0/1)
            in_ax = (self.field_axes().get("input") or {}).get(self._shard_mode)
            length = (
                input.shape[in_ax % input.ndim] if in_ax is not None else None
            )
            if length is not None and length % axis_size != 0:
                raise ValueError(
                    "use_mesh(mode={!r}): axis length {} is not divisible by "
                    "the {}-way mesh axis {!r}; choose a mesh that divides it, "
                    "size the STFT so one does, or pass "
                    "use_mesh(..., pad_bins=True) for solvers that support "
                    "zero-bin padding".format(
                        self._shard_mode, length, axis_size, self._shard_axis_name
                    )
                )
            self._validate_mesh(input)
            state_shapes = jax.eval_shape(self._init_fn(), Xp, kwargs_p)
            state_sh = self._sharding_tree(state_shapes)
            x_sh = self._sharding_tree({"input": Xp})["input"]
            kw_sh = self._sharding_tree(kwargs_p)
            scalar_sh = self._replicated()
        self._state_sh = state_sh

        init = self._get_jit(
            "init:" + ",".join(sorted(kwargs_p)),
            self._init_fn,
            in_shardings=None if mesh is None else (x_sh, kw_sh),
            out_shardings=state_sh,
        )
        state = init(Xp, kwargs_p)
        self._sync_attributes(state)

        if self.recordable_loss and self.record_initial_loss:
            nll_fn = self._get_jit(
                "nll",
                self._nll_fn,
                in_shardings=None if mesh is None else (state_sh,),
            )
            self.loss.append(float(nll_fn(state)))

        if self.callbacks is not None:
            if self.callback_on_init:
                self._on_callback(state)
            step = self._get_jit(
                "step",
                self._step_fn,
                in_shardings=None if mesh is None else (state_sh,),
                out_shardings=state_sh,
            )
            nll_fn = self._get_jit(
                "nll",
                self._nll_fn,
                in_shardings=None if mesh is None else (state_sh,),
            )
            for _ in range(iteration):
                state = step(state)
                if self.recordable_loss:
                    self.loss.append(float(nll_fn(state)))
                self._sync_attributes(state)
                self._on_callback(state)
        elif iteration > 0:
            run = self._get_jit(
                "scan:{}:{}".format(iteration, self.recordable_loss),
                lambda: self._scan_fn(iteration, self.recordable_loss),
                in_shardings=None if mesh is None else (state_sh,),
                out_shardings=None if mesh is None else (state_sh, scalar_sh),
            )
            state, losses = run(state)
            if self.recordable_loss:
                self.loss.extend(np.asarray(jax.device_get(losses)).tolist())
            self._sync_attributes(state)

        output = self._run_finalize(state)
        if self._bin_pad:
            output = output[:, : n_bins_true]
        self.estimation = output
        return output

    def _run_finalize(self, state):
        """Jitted finalize by default; solvers with host-side post-processing
        (e.g. FDICA permutation alignment) override this."""
        state_sh = getattr(self, "_state_sh", None)
        finalize = self._get_jit(
            "finalize",
            self._finalize_fn,
            in_shardings=None if state_sh is None else (state_sh,),
        )
        return to_host(finalize(state))

    def _on_callback(self, state):
        for callback in self.callbacks:
            callback(self)

    # ------------------------------------------------------------------ #
    # checkpoint / resume
    # ------------------------------------------------------------------ #
    def save_state(self, path):
        """Write the warm-startable state arrays to an ``.npz`` checkpoint.

        The reference's resume mechanism is kwargs injection
        (``bss/iva.py:53-58``); this persists exactly those arrays so
        ``solver(X, iteration=N, **load_state(path))`` resumes a run.
        """
        payload = {}
        for field in self.state_fields:
            value = getattr(self, field, None)
            if value is not None:
                payload[field] = np.asarray(value)
        np.savez(path, **payload)

    @staticmethod
    def load_state(path):
        """Load a checkpoint written by :meth:`save_state` as warm-start
        kwargs for ``__call__``."""
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
