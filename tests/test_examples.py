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


# every public `separate.py` method at a tiny config (VERDICT r3 item 6:
# a broken CLI flag must fail under pytest, not ship silently)
SEPARATE_METHODS = [
    ("auxiva", ["--spatial", "IP"]),
    ("auxiva", ["--spatial", "ISS"]),
    ("auxiva", ["--spatial", "IP2"]),
    ("auxiva-gauss", []),
    ("proxiva", []),
    ("fdica", []),
    ("fdica-grad", []),
    ("ilrma", ["--n-basis", "2"]),
    ("tilrma", ["--n-basis", "2", "--nu", "1"]),
    ("mnmf", ["--n-basis", "2"]),
    ("fastmnmf", ["--n-basis", "2"]),
    ("ipsdta", ["--n-basis", "2", "--n-blocks", "8"]),
]


def _write_mixture_wav(tmp_path, n_channels=2, n_samples=6000):
    from audio_source_separation_tpu.utils import write_wav

    rng = np.random.RandomState(0)
    S = rng.randn(n_channels, n_samples) * 0.1
    A = np.eye(n_channels) + 0.5 * rng.rand(n_channels, n_channels)
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, A @ S, 16000, channel_last=False)
    return wav


@pytest.mark.parametrize("method,extra", SEPARATE_METHODS,
                         ids=lambda v: "-".join(v) if isinstance(v, list) else v)
def test_separate_every_method(tmp_path, method, extra):
    from audio_source_separation_tpu.utils import read_wav

    wav = _write_mixture_wav(tmp_path)
    out = str(tmp_path / "sep")
    _run_script(
        "separate.py",
        ["--input", wav, "--method", method, "--iterations", "2",
         "--fft-size", "256", "--out", out] + extra,
        tmp_path,
    )
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["method"] == method
    assert summary["outputs"] == 2
    for n in range(2):
        y, _ = read_wav(os.path.join(out, "source_{}.wav".format(n)))
        assert np.all(np.isfinite(y))


@pytest.mark.parametrize("method", ["dsbf", "mvdr"])
def test_beamform_driver(tmp_path, method):
    from audio_source_separation_tpu.utils import read_wav

    wav = _write_mixture_wav(tmp_path)
    out = str(tmp_path / "bf")
    _run_script(
        "beamform.py",
        ["--input", wav, "--method", method, "--degrees", "0", "90",
         "--mic-positions", "-0.04", "0.04", "--fft-size", "256", "--out", out],
        tmp_path,
    )
    for n in range(2):
        y, _ = read_wav(os.path.join(out, "source_{}.wav".format(n)))
        assert np.all(np.isfinite(y)) and np.abs(y).max() > 0


@pytest.mark.parametrize("metric", ["EUC", "KL", "IS", "t", "Cauchy"])
def test_decompose_nmf_driver(tmp_path, metric):
    from audio_source_separation_tpu.utils import write_wav

    rng = np.random.RandomState(0)
    wav = str(tmp_path / "mono.wav")
    write_wav(wav, rng.randn(6000) * 0.1, 16000)
    out = str(tmp_path / "nmf")
    _run_script(
        "decompose_nmf.py",
        ["--input", wav, "--metric", metric, "--n-basis", "2",
         "--iterations", "3", "--fft-size", "256", "--hop-size", "128",
         "--out", out],
        tmp_path,
    )
    factors = np.load(os.path.join(out, "factors.npz"))
    assert factors["basis"].shape[1] == 2
    assert np.all(np.isfinite(factors["basis"]))
    for k in range(2):
        assert os.path.exists(os.path.join(out, "basis_{}.wav".format(k)))


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
