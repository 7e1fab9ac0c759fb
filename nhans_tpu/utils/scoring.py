"""Quality scoring: SI-SDR / SDR / log-spectral distance.

The reference publishes no in-repo metrics (results live in the external
MTAP/SPL papers; BASELINE.md).  These implementations provide the SI-SDR
parity measurements against the DEMO_N-HANS golden corpora and between
this framework and the TF reference outputs.
"""

from __future__ import annotations

import numpy as np


def _align(est: np.ndarray, ref: np.ndarray):
    n = min(len(est), len(ref))
    return np.asarray(est[:n], np.float64), np.asarray(ref[:n], np.float64)


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR in dB (Le Roux et al., 2019)."""
    est, ref = _align(est, ref)
    ref_energy = np.sum(ref ** 2) + 1e-12
    proj = (np.sum(est * ref) / ref_energy) * ref
    noise = est - proj
    return float(10 * np.log10((np.sum(proj ** 2) + 1e-12)
                               / (np.sum(noise ** 2) + 1e-12)))


def sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Plain SDR in dB."""
    est, ref = _align(est, ref)
    noise = est - ref
    return float(10 * np.log10((np.sum(ref ** 2) + 1e-12)
                               / (np.sum(noise ** 2) + 1e-12)))


def lsd(est: np.ndarray, ref: np.ndarray, frame_length: int = 400,
        frame_step: int = 160) -> float:
    """Log-spectral distance (dB RMS over frames/bins)."""
    est, ref = _align(est, ref)

    def spec(x):
        nf = 1 + (len(x) - frame_length) // frame_step
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_length)
                               / frame_length)
        frames = np.stack([x[i * frame_step:i * frame_step + frame_length] * w
                           for i in range(nf)])
        return 20 * np.log10(np.abs(np.fft.rfft(frames, axis=-1)) + 1e-8)

    a, b = spec(est), spec(ref)
    n = min(len(a), len(b))
    return float(np.sqrt(np.mean((a[:n] - b[:n]) ** 2)))


def snr_improvement(mixed: np.ndarray, est: np.ndarray,
                    ref: np.ndarray) -> float:
    """SI-SDR(est, ref) - SI-SDR(mixed, ref): the enhancement gain."""
    return si_sdr(est, ref) - si_sdr(mixed, ref)
