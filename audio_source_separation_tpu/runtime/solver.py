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

    def __init__(self, callbacks=None, recordable_loss=True, eps=EPS):
        if callbacks is not None and callable(callbacks):
            callbacks = [callbacks]
        self.callbacks = callbacks
        self.eps = eps
        self.input = None
        self.recordable_loss = recordable_loss
        self.loss = [] if recordable_loss else None
        self._jit_cache = {}

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
    def _get_jit(self, name, fn_factory):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn_factory())
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

    def _scan_fn(self, iteration, record_loss):
        def run(sp):
            state = unpack(sp)

            def body(s, _):
                s = self.update_state(s)
                out = self.nll(s) if record_loss else jnp.zeros(())
                return s, out

            state, losses = jax.lax.scan(body, state, None, length=iteration)
            return pack(state), losses

        return run

    def _sync_attributes(self, state_packed):
        host_state = to_host(state_packed)
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

        Xp = pack(input)
        kwargs_p = pack(
            {k: np.asarray(v) for k, v in state_kwargs.items() if v is not None}
        )
        init = self._get_jit("init:" + ",".join(sorted(kwargs_p)), self._init_fn)
        state = init(Xp, kwargs_p)
        self._sync_attributes(state)

        if self.recordable_loss and self.record_initial_loss:
            nll_fn = self._get_jit("nll", self._nll_fn)
            self.loss.append(float(nll_fn(state)))

        if self.callbacks is not None:
            if self.callback_on_init:
                self._on_callback(state)
            step = self._get_jit("step", self._step_fn)
            nll_fn = self._get_jit("nll", self._nll_fn)
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
            )
            state, losses = run(state)
            if self.recordable_loss:
                self.loss.extend(np.asarray(jax.device_get(losses)).tolist())
            self._sync_attributes(state)

        output = self._run_finalize(state)
        self.estimation = output
        return output

    def _run_finalize(self, state):
        """Jitted finalize by default; solvers with host-side post-processing
        (e.g. FDICA permutation alignment) override this."""
        finalize = self._get_jit("finalize", self._finalize_fn)
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
