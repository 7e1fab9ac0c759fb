"""Tests for tools/synth_noises.py (procedural noise bank enrichment).

No JAX; pure numpy/scipy, safe to run next to a live TPU process.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "synth_noises.py")


@pytest.fixture(scope="module")
def bank(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    subprocess.run(
        [sys.executable, TOOL, "--out", str(out), "--count", "12",
         "--seconds", "2", "--seed", "7"],
        check=True, capture_output=True)
    return out


def test_output_wavs_valid(bank):
    files = sorted(os.listdir(bank))
    assert len(files) == 12
    for f in files:
        fs, x = wavfile.read(os.path.join(bank, f))
        assert fs == 16000
        assert x.dtype == np.int16
        assert len(x) == 2 * 16000
        assert np.max(np.abs(x)) > 1000          # audible, not silence
        assert np.max(np.abs(x)) <= 0.75 * 32767  # headroom preserved


def test_deterministic_given_seed(bank, tmp_path):
    subprocess.run(
        [sys.executable, TOOL, "--out", str(tmp_path), "--count", "12",
         "--seconds", "2", "--seed", "7"],
        check=True, capture_output=True)
    for f in sorted(os.listdir(bank)):
        _, a = wavfile.read(os.path.join(bank, f))
        _, b = wavfile.read(os.path.join(tmp_path, f))
        assert np.array_equal(a, b), f


def test_files_are_spectrally_diverse(bank):
    """The point of the tool: no two files should be near-identical, and
    the set should span tonal (low flatness) to broadband (high)."""
    flats, specs = [], []
    for f in sorted(os.listdir(bank)):
        _, x = wavfile.read(os.path.join(bank, f))
        x = x.astype(np.float64)
        x /= np.max(np.abs(x)) + 1e-9
        s = np.abs(np.fft.rfft(x)) ** 2
        flats.append(np.exp(np.mean(np.log(s + 1e-12)))
                     / np.mean(s + 1e-12))
        specs.append(np.log(s + 1e-12))
    flats = np.asarray(flats)
    assert flats.min() < 0.1      # at least one strongly tonal noise
    assert flats.max() > 0.3      # at least one broadband noise
    # pairwise log-spectrum correlation: no near-duplicates
    specs = np.asarray(specs)
    specs -= specs.mean(axis=1, keepdims=True)
    norm = np.linalg.norm(specs, axis=1, keepdims=True)
    corr = (specs / norm) @ (specs / norm).T
    off = corr[~np.eye(len(corr), dtype=bool)]
    assert off.max() < 0.99
