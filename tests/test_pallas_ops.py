"""Pallas fused-spectrogram kernel vs the XLA DSP path (interpret mode on
CPU; real-TPU parity + timing is a separate gate: tools/verify_pallas_tpu.py,
run on the chip and recorded in PROFILE.md)."""

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


def test_pallas_with_reim_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 100)
    lm, re, im = pallas_log_spectrogram(x, interpret=True, with_reim=True)
    ref_re, ref_im = sp.stft(x)
    ref_lm = sp.log_magnitude(ref_re, ref_im)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ref_lm), atol=5e-3)
    scale = np.abs(np.asarray(ref_re)).max()
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref_re),
                               atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ref_im),
                               atol=5e-3 * scale)
    # the dispatch derives phase = arctan2(im, re): check against xla phase
    lm2, ph2 = sp.spectrogram(x)
    mag = np.exp(np.asarray(lm2))
    ph_k = np.arctan2(np.asarray(im), np.asarray(re))
    d = np.angle(np.exp(1j * (ph_k - np.asarray(ph2))))
    heavy = mag > (0.01 * mag.max())
    assert np.abs(d[heavy]).max() < 5e-2


def test_spectrogram_impl_dispatch(rng):
    """impl="pallas" through the public dsp API (interpret-free path on CPU
    resolves via jax.default_backend); force the kernel explicitly here."""
    x = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    # 1-D input round-trips through the [1, L] kernel layout
    lm = sp.log_spectrogram(x, impl="xla")
    lm_k = np.asarray(pallas_log_spectrogram(x[None], interpret=True))[0]
    np.testing.assert_allclose(lm_k, np.asarray(lm), atol=5e-3)
    # "auto" on CPU must resolve to xla (no pallas compile attempted)
    assert sp.resolve_stft_impl("auto") == "xla"
    lm_auto, ph_auto = sp.spectrogram(x, impl="auto")
    np.testing.assert_allclose(np.asarray(lm_auto), np.asarray(lm), atol=1e-5)


def test_pallas_shard_map_under_mesh(rng):
    """log_spectrogram(impl="pallas", mesh=...) wraps the kernel in
    shard_map over the data axis: numerics identical to the unsharded
    XLA formulation on a >1-device mesh (VERDICT round-1 item 5)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nhans_tpu.dsp.spectral import log_spectrogram
    from nhans_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4)
    x = (rng.standard_normal((8, 16000)) * 3000).astype(np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    got = jax.jit(lambda v: log_spectrogram(
        v, impl="pallas", mesh=mesh, interpret=True))(xs)
    # sharding must not change the kernel's numerics AT ALL
    unsharded = log_spectrogram(jnp.asarray(x), impl="pallas",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(unsharded))
    # and the kernel agrees with the XLA formulation to fp32 tolerance
    want = log_spectrogram(jnp.asarray(x), impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-3)
    # output keeps the data-axis sharding (no gather to one device)
    assert got.sharding.spec[0] == "data"
