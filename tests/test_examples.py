"""Driver-layer tests: the example scripts run end to end (the reference's
``egs/`` equivalents — SURVEY §2.5)."""

import json
import os
import runpy
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run_script(name, argv, tmp_path):
    old_argv = sys.argv
    sys.argv = [name] + argv
    sys.path.insert(0, EXAMPLES)
    try:
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.remove(EXAMPLES)


def test_walkthrough_produces_all_artifacts(tmp_path):
    out = str(tmp_path / "walkthrough")
    _run_script(
        "walkthrough.py",
        ["--out", out, "--iterations", "3", "--n-basis", "2"],
        tmp_path,
    )
    for artifact in (
        "loss_curve.csv",
        "sdri_curve.csv",
        "source_0.wav",
        "source_1.wav",
        "summary.json",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    assert os.path.isdir(os.path.join(out, "state"))
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert np.isfinite(summary["loss_last"])
    assert np.isfinite(summary["si_sdr_improvement_db"])


def test_separate_idlma_method(tmp_path):
    from audio_source_separation_tpu.utils import write_wav

    rng = np.random.RandomState(0)
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, rng.randn(2, 8000) * 0.1, 16000, channel_last=False)
    out = str(tmp_path / "sep")
    _run_script(
        "separate.py",
        [
            "--input", wav, "--method", "idlma", "--iterations", "2",
            "--fft-size", "256", "--hidden", "32", "--out", out,
        ],
        tmp_path,
    )
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["method"] == "idlma"
    assert summary["outputs"] == 2
    assert os.path.exists(os.path.join(out, "source_0.wav"))
