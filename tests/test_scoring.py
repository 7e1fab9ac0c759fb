import numpy as np

from nhans_tpu.utils.scoring import lsd, sdr, si_sdr, snr_improvement


def test_si_sdr_identity(rng):
    x = rng.standard_normal(8000)
    assert si_sdr(x, x) > 100
    assert si_sdr(3.7 * x, x) > 100  # scale-invariant
    assert sdr(x, x) > 100
    assert sdr(2 * x, x) < 10        # not scale-invariant


def test_si_sdr_known_value(rng):
    x = rng.standard_normal(8000)
    n = rng.standard_normal(8000)
    n -= (n @ x) / (x @ x) * x       # orthogonalize
    # SNR of x + a*n is ||x||^2 / a^2||n||^2
    a = np.sqrt((x @ x) / (n @ n) / 10 ** (5 / 10))  # 5 dB
    got = si_sdr(x + a * n, x)
    assert abs(got - 5.0) < 0.2


def test_snr_improvement(rng):
    x = rng.standard_normal(8000)
    noise = rng.standard_normal(8000)
    mixed = x + 0.5 * noise
    est = x + 0.1 * noise
    assert snr_improvement(mixed, est, x) > 10


def test_lsd_zero_for_identical(rng):
    x = rng.standard_normal(8000)
    assert lsd(x, x) < 1e-6
    assert lsd(x, x + 0.3 * rng.standard_normal(8000)) > 1.0


def test_stoi_properties(rng):
    from nhans_tpu.utils.scoring import stoi
    # speech-like: amplitude-modulated multi-tone (STOI needs temporal
    # envelope structure; pure stationary noise has degenerate envelopes)
    fs = 16000
    t = np.arange(fs * 3) / fs
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)
    x = env * (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 900 * t)
               + 0.3 * np.sin(2 * np.pi * 1800 * t))
    clean = stoi(x, x, fs)
    assert clean > 0.95, clean
    noise = rng.standard_normal(len(x))
    light = stoi(x + 0.1 * noise, x, fs)
    heavy = stoi(x + 2.0 * noise, x, fs)
    assert clean >= light > heavy, (clean, light, heavy)
    assert heavy < 0.8


def test_stoi_real_demo_golden():
    """On a real golden set, STOI(target,target)=1 and STOI(mixed,target)
    is lower."""
    import os
    from scipy.io import wavfile
    from nhans_tpu.utils.scoring import stoi
    d = "/root/reference/DEMO_N-HANS/denoising/example1"
    if not os.path.isdir(d):
        import pytest
        pytest.skip("reference demo corpus unavailable")
    files = {f.split("_")[-1]: os.path.join(d, f) for f in os.listdir(d)}
    _, tgt = wavfile.read(files["target.wav"])
    _, mixed = wavfile.read(files["mixed.wav"])
    assert stoi(tgt, tgt) > 0.99
    assert stoi(mixed, tgt) < stoi(tgt, tgt)


def test_pesq_gated():
    from nhans_tpu.utils.scoring import pesq_score
    x = np.sin(np.arange(32000) / 16000 * 2 * np.pi * 440)
    out = pesq_score(x, x)
    assert out is None or out > 3.0  # None when the pesq pkg is absent

def test_estoi_properties(rng):
    from nhans_tpu.utils.scoring import estoi
    # broadband speech-like carrier (amplitude-modulated noise) so every
    # 1/3-octave band carries signal — ESTOI weights all bands' envelopes
    # equally, so band-sparse multi-tones are degenerate for it
    fs = 16000
    t = np.arange(fs * 3) / fs
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)
    x = env * rng.standard_normal(len(t))
    clean = estoi(x, x, fs)
    assert clean > 0.95, clean
    noise = rng.standard_normal(len(x))
    light = estoi(x + 0.2 * noise, x, fs)
    heavy = estoi(x + 2.0 * noise, x, fs)
    assert clean > light > heavy, (clean, light, heavy)


def test_estoi_real_demo_golden():
    import os
    from scipy.io import wavfile
    from nhans_tpu.utils.scoring import estoi
    d = "/root/reference/DEMO_N-HANS/denoising/example1"
    if not os.path.isdir(d):
        import pytest
        pytest.skip("reference demo corpus unavailable")
    files = {f.split("_")[-1]: os.path.join(d, f) for f in os.listdir(d)}
    _, tgt = wavfile.read(files["target.wav"])
    _, mixed = wavfile.read(files["mixed.wav"])
    assert estoi(tgt, tgt) > 0.99
    assert estoi(mixed, tgt) < estoi(tgt, tgt)
