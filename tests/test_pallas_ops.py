"""Pallas fused-spectrogram kernel vs the XLA DSP path (interpret mode on
CPU; the same kernel is validated on real TPU hardware by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nhans_tpu.dsp.spectral as sp
from nhans_tpu.ops.stft_pallas import pallas_log_spectrogram


@pytest.mark.parametrize("L", [4000, 80000])
def test_pallas_log_spectrogram_matches_xla(rng, L):
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    got = np.asarray(pallas_log_spectrogram(x, interpret=True))
    ref = np.asarray(sp.spectrogram(x)[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_pallas_log_spectrogram_tiny(rng):
    # shorter than one tile; exercises tail masking + slicing
    x = jnp.asarray(rng.standard_normal((1, 720)).astype(np.float32))
    got = np.asarray(pallas_log_spectrogram(x, interpret=True))
    ref = np.asarray(sp.spectrogram(x)[0])
    assert got.shape == (1, 3, 201)
    np.testing.assert_allclose(got, ref, atol=5e-3)
