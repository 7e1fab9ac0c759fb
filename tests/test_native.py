"""Native (C++) wav decoder vs the scipy reference path."""

import os

import numpy as np
import pytest

from nhans_tpu.utils import native, wavio


@pytest.fixture(scope="module")
def built():
    if not native.ensure_built():
        pytest.skip("native toolchain unavailable")
    return True


def _write(tmp_path, name, data, fs=16000):
    from scipy.io import wavfile
    p = str(tmp_path / name)
    wavfile.write(p, fs, data)
    return p


def test_native_mono_matches_scipy(tmp_path, built, rng):
    x = (rng.standard_normal(12345) * 3000).astype(np.int16)
    p = _write(tmp_path, "m.wav", x)
    got, n, peak = native.read_wav(p, 20000)
    ref = wavio.read_wav_strict(p)
    assert n == 12345
    assert peak == np.abs(ref).max()
    np.testing.assert_array_equal(got[:n], ref.astype(np.float32))
    assert (got[n:] == 0).all()


def test_native_stereo_downmix(tmp_path, built, rng):
    x = (rng.standard_normal((4000, 2)) * 3000).astype(np.int16)
    p = _write(tmp_path, "s.wav", x)
    got, n, _peak = native.read_wav(p, 20000)
    ref = wavio.read_wav_strict(p)  # mean-downmixed float
    assert n == 4000
    np.testing.assert_allclose(got[:n], ref.astype(np.float32), atol=1e-4)


def test_native_truncates(tmp_path, built, rng):
    x = (rng.standard_normal(9000) * 100).astype(np.int16)
    p = _write(tmp_path, "t.wav", x)
    got, n, peak = native.read_wav(p, 4000)
    assert n == 4000
    np.testing.assert_array_equal(got, x[:4000].astype(np.float32))
    # whole-file peak is scanned PAST the 4000-sample buffer cap
    assert peak == float(np.abs(x).max())


def test_native_rejects_wrong_rate(tmp_path, built, rng):
    x = (rng.standard_normal(1000) * 100).astype(np.int16)
    p = _write(tmp_path, "r.wav", x, fs=8000)
    with pytest.raises(ValueError):
        native.read_wav(p, 4000)


def test_native_batch(tmp_path, built, rng):
    paths = []
    refs = []
    for i in range(5):
        x = (rng.standard_normal(3000 + 100 * i) * 2000).astype(np.int16)
        paths.append(_write(tmp_path, f"b{i}.wav", x))
        refs.append(x)
    buf, lens, peaks = native.load_batch(paths, 4000, num_threads=3)
    assert buf.shape == (5, 4000)
    for i in range(5):
        assert lens[i] == 3000 + 100 * i
        np.testing.assert_array_equal(buf[i, :lens[i]],
                                      refs[i].astype(np.float32))
        assert (buf[i, lens[i]:] == 0).all()
        assert peaks[i] == float(np.abs(refs[i]).max())


def test_native_batch_error(tmp_path, built):
    with pytest.raises(ValueError):
        native.load_batch([str(tmp_path / "missing.wav")], 100)


def test_native_batch_i16(tmp_path, built, rng):
    paths, refs = [], []
    for i in range(4):
        x = (rng.standard_normal(3000 + 50 * i) * 2000).astype(np.int16)
        paths.append(_write(tmp_path, f"q{i}.wav", x))
        refs.append(x)
    buf, lens, peaks = native.load_batch_i16(paths, 4000, num_threads=2)
    assert buf.dtype == np.int16
    for i in range(4):
        assert lens[i] == 3000 + 50 * i
        np.testing.assert_array_equal(buf[i, :lens[i]], refs[i])
        assert (buf[i, lens[i]:] == 0).all()
        assert peaks[i] == float(np.abs(refs[i]).max())


def test_native_i16_stereo_and_cap_peak(tmp_path, built, rng):
    x = (rng.standard_normal((9000, 2)) * 3000).astype(np.int16)
    p = _write(tmp_path, "qs.wav", x)
    buf, lens, peaks = native.load_batch_i16([p], 4000)
    ref = wavio.read_wav_strict(p)  # float mean downmix
    assert lens[0] == 4000
    np.testing.assert_allclose(buf[0].astype(np.float64),
                               np.rint(ref[:4000]), atol=1.0)
    # peak scanned over the WHOLE file (unrounded downmix)
    assert abs(peaks[0] - np.abs(ref).max()) < 0.51
