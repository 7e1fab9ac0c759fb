"""Masked on-device mixing vs the literal reference mixing oracle."""

import numpy as np
import jax.numpy as jnp

from nhans_tpu.dsp import mixing as M
from tests import reference_dsp as R

L = 4096  # static buffer


def _pad(x, n=L):
    out = np.zeros(n, np.float32)
    out[:len(x)] = x
    return out


def test_peak_normalize(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 3
    got = np.asarray(M.peak_normalize(jnp.asarray(_pad(x)), 1000))
    ref = x / (np.max(np.abs(x)) + 1e-6)
    np.testing.assert_allclose(got[:1000], ref, atol=1e-6)
    assert np.all(got[1000:] == 0)


def test_loop_or_trim_loops_short_noise(rng):
    noise = rng.standard_normal(300).astype(np.float32)
    got = np.asarray(M.loop_or_trim(jnp.asarray(_pad(noise)), 300, 1000))
    ref = np.tile(noise, 4)[:1000]
    np.testing.assert_allclose(got[:1000], ref, atol=1e-6)
    assert np.all(got[1000:] == 0)


def test_loop_or_trim_trims_long_noise(rng):
    noise = rng.standard_normal(2000).astype(np.float32)
    got = np.asarray(M.loop_or_trim(jnp.asarray(_pad(noise)), 2000, 500))
    np.testing.assert_allclose(got[:500], noise[:500], atol=1e-6)
    assert np.all(got[500:] == 0)


def test_mix_two_noise_matches_reference(rng):
    clean = rng.standard_normal(2000).astype(np.float32)
    pos = rng.standard_normal(700).astype(np.float32)
    neg = rng.standard_normal(3000).astype(np.float32)
    clean /= np.max(np.abs(clean)) + 1e-6
    pos /= np.max(np.abs(pos)) + 1e-6
    neg /= np.max(np.abs(neg)) + 1e-6

    mixed, target, pos_s, neg_s = M.mix_two_noise(
        jnp.asarray(_pad(clean)), jnp.asarray(_pad(pos)), jnp.asarray(_pad(neg)),
        2000, 700, 3000, 3, -3)
    rm, rt, rp, rn = R.domixing_ref(clean.astype(np.float64),
                                    pos.astype(np.float64),
                                    neg.astype(np.float64), 3, -3)
    np.testing.assert_allclose(np.asarray(mixed)[:2000], rm, atol=1e-4)
    np.testing.assert_allclose(np.asarray(target)[:2000], rt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pos_s)[:2000], rp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(neg_s)[:2000], rn, atol=1e-4)
    assert np.all(np.asarray(mixed)[2000:] == 0)


def test_mix_two_noise_batched(rng):
    clean = rng.standard_normal((2, L)).astype(np.float32)
    pos = rng.standard_normal((2, L)).astype(np.float32)
    neg = rng.standard_normal((2, L)).astype(np.float32)
    lens = np.array([1500, 2500], np.int32)
    mixed, target, _, _ = M.mix_two_noise(
        jnp.asarray(clean), jnp.asarray(pos), jnp.asarray(neg),
        lens, np.array([900, 1200]), np.array([800, 4096]),
        np.array([0, 5]), np.array([8, -3]))
    assert mixed.shape == (2, L)
    for b in range(2):
        rm, rt, _, _ = R.domixing_ref(
            clean[b, :lens[b]].astype(np.float64),
            pos[b, :[900, 1200][b]].astype(np.float64),
            neg[b, :[800, 4096][b]].astype(np.float64),
            [0, 5][b], [8, -3][b])
        np.testing.assert_allclose(np.asarray(mixed)[b, :lens[b]], rm, atol=1e-4)
        np.testing.assert_allclose(np.asarray(target)[b, :lens[b]], rt, atol=1e-4)


def test_mix_one_noise_matches_reference(rng):
    clean = rng.standard_normal(2000).astype(np.float32)
    noise = rng.standard_normal(900).astype(np.float32)
    c, n, m, k = M.mix_one_noise(jnp.asarray(_pad(clean)),
                                 jnp.asarray(_pad(noise)), 2000, 900, 1)
    rc, rn, rm = R.domixing_one_ref(clean.astype(np.float64),
                                    noise.astype(np.float64), 1)
    np.testing.assert_allclose(np.asarray(m)[:2000], rm, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n)[:2000], rn, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c)[:2000], rc, atol=1e-6)
    # K scales the raw (un-looped) noise to the looped version's values
    np.testing.assert_allclose(np.asarray(k) * noise[:900],
                               np.asarray(n)[:900], atol=1e-4)


def test_zero_noise_gain_is_one():
    clean = np.ones(100, np.float32)
    silent = np.zeros(100, np.float32)
    mixed, target, pos_s, _ = M.mix_two_noise(
        jnp.asarray(_pad(clean)), jnp.asarray(_pad(silent)), jnp.asarray(_pad(silent)),
        100, 100, 100, 0, 0)
    # K == 1 for silent noise (reference reader.py:154-155): mixed == clean/peak
    np.testing.assert_allclose(np.asarray(mixed)[:100],
                               clean / (1.0 + 1e-6), atol=1e-5)


def test_snr_index_from_path_is_stable():
    # Pins the md5-derived eval SNR selection (reference reader.py:212-216).
    import hashlib
    p = "/data/speech/valid/foo.wav"
    assert M.snr_index_from_path(p, 5, 8) == int(
        hashlib.md5(p.encode()).hexdigest()[:8], 16) % 5
    assert M.snr_index_from_path(p, 5, 6) == int(
        hashlib.md5(p.encode()).hexdigest()[:6], 16) % 5
    assert M.snr_index_from_path(p.encode(), 5, 8) == M.snr_index_from_path(p, 5, 8)


def test_windowing_pad_and_strided():
    from nhans_tpu.dsp import windowing as W
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    win = np.asarray(W.strided_windows(jnp.asarray(x), 5, 1))
    assert win.shape == (10, 5, 2)
    # window i is centered at frame i: pad_before = 2 for length 5
    np.testing.assert_allclose(win[3, :, 0], [2, 4, 6, 8, 10])
    # first window: 2 zero pad frames then frames 0..2
    np.testing.assert_allclose(win[0, :, 0], [0, 0, 0, 2, 4])


def test_rest_crop_indices_matches_concat():
    from nhans_tpu.dsp import windowing as W
    T, winstart, winlen, ctxlen, start = 50, 12, 7, 20, 9
    x = np.arange(T)
    rest = np.concatenate([x[:winstart], x[winstart + winlen:]])
    ref = rest[start:start + ctxlen]
    idx = np.asarray(W.rest_crop_indices(start, ctxlen, winstart, winlen))
    np.testing.assert_array_equal(x[idx], ref)
