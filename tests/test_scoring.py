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
