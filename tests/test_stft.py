"""Parity + property tests for nhans_tpu.dsp.stft against the literal
tf.signal-semantics oracle in reference_dsp.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nhans_tpu.dsp.spectral as S
from tests import reference_dsp as R


def _sig(rng, n=4000):
    return (rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_stft_matches_reference(rng, method):
    x = _sig(rng)
    re, im = S.stft(jnp.asarray(x), 400, 160, method=method)
    ref = R.stft_ref(x, 400, 160)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert got.shape == ref.shape == (23, 201)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 2000)).astype(np.float32)
    re, im = S.stft(jnp.asarray(x))
    assert re.shape == (3, 11, 201)
    ref = R.stft_ref(x[1])
    np.testing.assert_allclose(np.asarray(re[1]) + 1j * np.asarray(im[1]),
                               ref, atol=2e-3, rtol=1e-4)


def test_num_frames_matches_tf_semantics():
    assert S.num_frames(400) == 1
    assert S.num_frames(399) == 0
    assert S.num_frames(560) == 2
    assert S.num_frames(559) == 1
    assert S.num_frames(16000) == 98


def test_synthesis_window_matches_reference():
    got = np.asarray(S.synthesis_window(400, 160))
    ref = R.inverse_stft_window_ref(400, 160)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_istft_matches_reference(rng, method):
    spec = R.stft_ref(_sig(rng, 3600))
    re = jnp.asarray(np.real(spec), jnp.float32)
    im = jnp.asarray(np.imag(spec), jnp.float32)
    got = np.asarray(S.istft(re, im, 400, 160, method=method))
    ref = R.istft_ref(spec)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_roundtrip_reconstruction(rng):
    """iSTFT(STFT(x)) == x in the fully-overlapped interior — this is the
    SURVEY.md hard-part #1 (window normalization parity)."""
    x = _sig(rng, 8080)
    re, im = S.stft(jnp.asarray(x))
    y = np.asarray(S.istft(re, im))
    # interior: skip one frame_length at each end
    np.testing.assert_allclose(y[400:-400], x[400:len(y) - 400], atol=1e-3)


def test_logmag_phase_and_inverse(rng):
    x = _sig(rng, 4000)
    logmag, phase = S.spectrogram(jnp.asarray(x))
    ref = R.stft_ref(x)
    np.testing.assert_allclose(np.asarray(logmag),
                               np.log(np.abs(ref) + 1e-5), atol=5e-3)
    dphi = np.angle(np.exp(1j * (np.asarray(phase) - np.angle(ref))))
    np.testing.assert_allclose(dphi, np.zeros_like(dphi), atol=2e-2)
    y = np.asarray(S.istft_from_logmag(logmag, phase))
    x_ref = R.istft_ref(np.exp(np.log(np.abs(ref) + 1e-5)) * np.exp(1j * np.angle(ref)))
    np.testing.assert_allclose(y, x_ref, atol=2e-3)


def test_overlap_add_matches_loop(rng):
    frames = rng.standard_normal((7, 400)).astype(np.float32)
    got = np.asarray(S.overlap_add(jnp.asarray(frames), 160))
    ref = np.zeros(160 * 6 + 400)
    for m in range(7):
        ref[m * 160:m * 160 + 400] += frames[m]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_stft_under_jit(rng):
    x = jnp.asarray(_sig(rng, 2000))
    f = jax.jit(lambda s: S.spectrogram(s))
    a = f(x)
    b = S.spectrogram(x)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
