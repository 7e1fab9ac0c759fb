"""Property tests for the vendored pure-numpy PESQ (utils/pesq_np.py):
bounds, identity score, SNR monotonicity, delay robustness, and the
evaluate-path integration."""

import numpy as np
import pytest

from nhans_tpu.utils.pesq_np import pesq_np
from nhans_tpu.utils.scoring import pesq_score


def _speech_like(n, fs=16000, seed=0):
    """Synthetic voiced signal: broadband harmonic stack (partials to
    ~4 kHz, 1/k rolloff) with an AM envelope."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 120.0 + 10.0 * np.sin(2 * np.pi * 2.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * phase) / k for k in range(1, 30))
    env = 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 3.0 * t), 0, 1)
    x = x * env + 0.01 * rng.standard_normal(n)
    return (x / np.max(np.abs(x)) * 8000.0).astype(np.float64)


def test_identity_scores_max():
    x = _speech_like(32000)
    mos = pesq_np(16000, x, x)
    assert mos > 4.0


def test_bounds_and_noise_floor():
    rng = np.random.default_rng(1)
    x = _speech_like(32000)
    noise_only = rng.standard_normal(32000) * 8000.0
    lo = pesq_np(16000, x, noise_only)
    assert 1.0 <= lo <= 5.0
    assert lo < 3.0  # pure noise is a bad "enhancement"
    assert pesq_np(16000, x, x) - lo > 1.5


def test_monotonic_in_snr():
    rng = np.random.default_rng(2)
    x = _speech_like(48000)
    noise = rng.standard_normal(48000)
    noise = noise / np.sqrt(np.mean(noise ** 2))
    sig_rms = np.sqrt(np.mean(x ** 2))
    scores = []
    for snr_db in (0, 10, 20, 30):
        k = sig_rms / (10.0 ** (snr_db / 20.0))
        scores.append(pesq_np(16000, x, x + k * noise))
    assert scores == sorted(scores), scores
    assert scores[-1] > scores[0] + 0.5


def test_constant_delay_invariance():
    x = _speech_like(48000)
    rng = np.random.default_rng(3)
    deg = x + 300.0 * rng.standard_normal(len(x))
    base = pesq_np(16000, x, deg)
    shifted = pesq_np(16000, x, np.concatenate(
        [np.zeros(800), deg]))  # +50 ms constant delay
    assert abs(base - shifted) < 0.35


def test_narrowband_mode():
    x = _speech_like(24000, fs=8000)
    assert pesq_np(8000, x, x, mode="nb") > 3.5


def test_pesq_score_always_available():
    """The eval path's pesq_score never returns None now (falls back to
    the numpy implementation when the C package is absent)."""
    x = _speech_like(32000)
    s = pesq_score(x * 0.9, x)
    assert s is not None and 1.0 <= s <= 5.0


def test_degradation_ordering():
    """More aggressive spectral mangling scores lower."""
    x = _speech_like(48000)
    mild = np.convolve(x, np.ones(3) / 3.0, mode="same")
    harsh = np.convolve(x, np.ones(33) / 33.0, mode="same")
    assert pesq_np(16000, x, mild) > pesq_np(16000, x, harsh)


def test_conformance_vs_reference_pesq_package():
    """Conformance pin against the reference `pesq` package (ITU P.862
    C sources) — skipped when the package is unavailable (it is not in
    this image; zero egress), so the moment the environment ever gains
    it this re-derivation is automatically validated.  Tolerance is a
    band, not equality: utils/pesq_np.py documents global-only time
    alignment and formula-derived Bark tables (ranking-faithful, not
    conformance-certified)."""
    ref_pesq = pytest.importorskip("pesq")

    fs = 16000
    ref = _speech_like(4 * fs)
    rng = np.random.default_rng(7)
    for snr_db, tol in ((30.0, 0.6), (10.0, 0.6), (0.0, 0.8)):
        noise = rng.standard_normal(len(ref))
        noise *= np.sqrt(np.mean(ref ** 2) / 10 ** (snr_db / 10)
                         / np.mean(noise ** 2))
        deg = ref + noise
        want = ref_pesq.pesq(fs, ref / 32768.0, deg / 32768.0, "wb")
        got = pesq_np(fs, ref, deg, mode="wb")
        assert abs(got - want) <= tol, (snr_db, got, want)
