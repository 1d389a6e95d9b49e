"""Observability callbacks (productized reference notebook patterns).

The reference's only observability mechanism is callbacks invoked with the
solver instance after init and every iteration (``bss/iva.py:76-89``); the
notebooks use them for (a) per-iteration SDR-improvement tracking via
kwargs-injected ground truth (``test_gauss-ilrma.ipynb`` cells 66-72), and
(b) state snapshots to npz (cell 75, ``BasisActivationSaver``).  These are
those two patterns as reusable classes, plus a loss logger.
"""

import os

import numpy as np

from .metrics import bss_eval_sources, pit_si_sdr
from ..transform.stft import istft


class SDRImprovementCallback:
    """Per-iteration PIT SI-SDR against ground-truth sources.

    Equivalent of the notebooks' ``record_sdri`` callback: pass ground truth
    at call time (``solver(X, iteration=N, callbacks=cb)``), read
    ``cb.history`` afterwards.
    """

    def __init__(
        self, targets, fft_size, hop_size, length=None, apply_projection_back=True
    ):
        self.targets = np.asarray(targets)  # (n_sources, n_samples)
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.length = length if length is not None else self.targets.shape[-1]
        # mid-run estimates carry arbitrary per-bin scales (solvers restore
        # scale only at finalize); SI-SDR is invariant to a GLOBAL per-source
        # scale but not to a per-bin filter, so the notebook-equivalent curve
        # projects back against the reference mic every iteration
        self.apply_projection_back = apply_projection_back
        self.history = []

    def __call__(self, solver):
        estimation = getattr(solver, "estimation", None)
        if estimation is None:
            return
        estimation = np.asarray(estimation)
        if self.apply_projection_back and getattr(solver, "input", None) is not None:
            from ..algorithm.projection_back import projection_back

            reference_id = getattr(solver, "reference_id", 0)
            scale = np.asarray(
                projection_back(estimation, np.asarray(solver.input)[reference_id])
            )
            estimation = estimation * scale[..., None]
        y = np.asarray(
            istft(
                estimation,
                fft_size=self.fft_size,
                hop_size=self.hop_size,
                length=self.length,
            )
        )
        value, _ = pit_si_sdr(y, self.targets[:, : y.shape[-1]])
        self.history.append(value)


class BSSEvalCallback:
    """Per-iteration BSS Eval SDR/SIR/SAR against ground-truth sources —
    the reference notebooks' ``record_sdri`` pattern with the mir_eval
    metric itself (``test_gauss-ilrma.ipynb`` cells 66-72 call
    ``mir_eval.bss_eval_sources`` every iteration).

    ``history`` collects ``(sdr, sir, sar)`` triples of per-source arrays;
    ``sdri_history`` the mean-SDR improvement over the mixture baseline.
    The 512-tap joint projection is much heavier than SI-SDR, so ``stride``
    subsamples iterations (the notebooks pay the same cost every iteration).
    """

    def __init__(
        self,
        targets,
        fft_size,
        hop_size,
        length=None,
        apply_projection_back=True,
        filter_length=512,
        stride=1,
    ):
        self.targets = np.asarray(targets)  # (n_sources, n_samples)
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.length = length if length is not None else self.targets.shape[-1]
        self.apply_projection_back = apply_projection_back
        self.filter_length = filter_length
        self.stride = max(int(stride), 1)
        self.history = []
        self.sdri_history = []
        self._baseline = None
        self._count = 0

    def __call__(self, solver):
        count = self._count
        self._count += 1
        if count % self.stride:
            return
        estimation = getattr(solver, "estimation", None)
        if estimation is None:
            return
        estimation = np.asarray(estimation)
        if self.apply_projection_back and getattr(solver, "input", None) is not None:
            from ..algorithm.projection_back import projection_back

            reference_id = getattr(solver, "reference_id", 0)
            scale = np.asarray(
                projection_back(estimation, np.asarray(solver.input)[reference_id])
            )
            estimation = estimation * scale[..., None]
        y = np.asarray(
            istft(
                estimation,
                fft_size=self.fft_size,
                hop_size=self.hop_size,
                length=self.length,
            )
        )
        targets = self.targets[:, : y.shape[-1]]
        sdr, sir, sar, _ = bss_eval_sources(
            targets, y, filter_length=self.filter_length
        )
        self.history.append((sdr, sir, sar))
        if self._baseline is None and getattr(solver, "input", None) is not None:
            from ..transform.stft import istft as _istft

            reference_id = getattr(solver, "reference_id", 0)
            mix = np.asarray(
                _istft(
                    np.asarray(solver.input)[reference_id],
                    fft_size=self.fft_size,
                    hop_size=self.hop_size,
                    length=self.length,
                )
            )
            base_sdr, _, _, _ = bss_eval_sources(
                targets,
                np.broadcast_to(mix[None], targets.shape),
                filter_length=self.filter_length,
            )
            self._baseline = float(np.mean(base_sdr))
        if self._baseline is not None:
            self.sdri_history.append(float(np.mean(sdr)) - self._baseline)


class StateSnapshotCallback:
    """Write selected solver state arrays to ``.npz`` per iteration
    (the notebooks' ``BasisActivationSaver``)."""

    def __init__(self, directory, fields=("basis", "activation"), prefix="state"):
        self.directory = directory
        self.fields = fields
        self.prefix = prefix
        self.iteration = 0
        os.makedirs(directory, exist_ok=True)

    def __call__(self, solver):
        payload = {}
        for field in self.fields:
            value = getattr(solver, field, None)
            if value is not None:
                payload[field] = np.asarray(value)
        path = os.path.join(
            self.directory, "{}_{}.npz".format(self.prefix, self.iteration)
        )
        np.savez(path, **payload)
        self.iteration += 1


class LossLogger:
    """Print the latest recorded loss every ``stride`` iterations."""

    def __init__(self, stride=10, printer=print):
        self.stride = stride
        self.printer = printer
        self.iteration = 0

    def __call__(self, solver):
        if solver.loss and self.iteration % self.stride == 0:
            self.printer(
                "iteration {}: loss {:.6g}".format(self.iteration, solver.loss[-1])
            )
        self.iteration += 1
