"""Alias of :mod:`audio_source_separation_tpu.transform.stft`.

The reference ships two byte-identical STFT modules (``transform/stft.py`` and
``algorithm/stft.py``) and different solvers import different copies
(SURVEY.md §1).  This framework has exactly one implementation; this module
preserves the reference's import surface.
"""

from ..transform.stft import build_optimal_window, build_window, istft, stft

__all__ = ["stft", "istft", "build_window", "build_optimal_window"]
