"""SNR mixing math — parity with the reference's numpy mixing, but
implemented as masked, fixed-shape JAX so it jit-compiles into the train
step (the reference runs this on host threads through ``tf.py_func``,
reference reader.py:118-224,321-327; we run it on the TPU).

All device functions take *padded* waveform buffers of a static length L
plus per-example valid lengths, because XLA requires static shapes.  Every
reduction is masked to the valid region.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-6  # reference uses max(|x|) + 0.000001, reader.py:170-174,187-189


def _mask(x: jnp.ndarray, length) -> jnp.ndarray:
    """[..., L] validity mask from per-example lengths (broadcastable)."""
    ar = jnp.arange(x.shape[-1], dtype=jnp.int32)
    return (ar < jnp.asarray(length)[..., None]).astype(x.dtype)


def peak_normalize(x: jnp.ndarray, length, peak=None) -> jnp.ndarray:
    """x / (max |x| + 1e-6) over the valid region (reference reader.py:187).

    ``peak`` optionally supplies a host-computed whole-file peak (used when
    the buffer was length-bucketed and may no longer contain the global
    maximum)."""
    m = _mask(x, length)
    if peak is None:
        peak = jnp.max(jnp.abs(x) * m, axis=-1, keepdims=True)
    else:
        peak = jnp.asarray(peak, x.dtype)[..., None]
    return x * m / (peak + _EPS)


def loop_or_trim(noise: jnp.ndarray, noise_len, target_len) -> jnp.ndarray:
    """Cyclically repeat (or cut) noise to target_len inside the static
    buffer (reference reader.py:132-144).  Output is zero beyond target_len.
    """
    length = noise.shape[-1]
    ar = jnp.arange(length, dtype=jnp.int32)
    nlen = jnp.maximum(jnp.asarray(noise_len, jnp.int32), 1)
    if noise.ndim > 1:
        idx = jnp.broadcast_to(jnp.remainder(ar[None, :], nlen[..., None]),
                               noise.shape)
        out = jnp.take_along_axis(noise, idx, axis=-1)
    else:
        out = noise[jnp.remainder(ar, nlen)]
    return out * _mask(out, target_len)


def _power(x: jnp.ndarray, length) -> jnp.ndarray:
    """mean(|x|^2) over the valid region (reference reader.py:149-151)."""
    m = _mask(x, length)
    n = jnp.maximum(jnp.asarray(length, x.dtype), 1.0)
    return jnp.sum(x * x * m, axis=-1) / n


def mixing_gains(psignal: jnp.ndarray, pnoise: jnp.ndarray,
                 snr_db: jnp.ndarray) -> jnp.ndarray:
    """K = sqrt((Psig/Pnoise) * 10^(-snr/10)); K = 1 when Pnoise == 0
    (reference reader.py:154-164)."""
    snr_db = jnp.asarray(snr_db, psignal.dtype)
    k = jnp.sqrt(psignal / jnp.where(pnoise == 0, 1.0, pnoise)
                 * jnp.power(10.0, -snr_db / 10.0))
    return jnp.where(pnoise == 0, jnp.ones_like(k), k)


def mix_two_noise(clean: jnp.ndarray, pos: jnp.ndarray, neg: jnp.ndarray,
                  clean_len, pos_len, neg_len, snr_pos, snr_neg
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Denoiser mixing (reference reader.py:128-176, ``domixing``).

    Inputs must already be individually peak-normalized and the clean
    signal trimmed to whole frames (reference reader.py:186-198).
    Returns (mixed, target, pos_scaled, neg_scaled), all divided by the
    mixed signal's peak — including ``target``, preserving the reference's
    normalize-target-by-mixed-max convention (reader.py:170-174).
    """
    nse_pos = loop_or_trim(pos, pos_len, clean_len)
    nse_neg = loop_or_trim(neg, neg_len, clean_len)
    psig = _power(clean, clean_len)
    k_pos = mixing_gains(psig, _power(nse_pos, clean_len), snr_pos)
    k_neg = mixing_gains(psig, _power(nse_neg, clean_len), snr_neg)
    pos_scaled = k_pos[..., None] * nse_pos
    neg_scaled = k_neg[..., None] * nse_neg
    mixed = clean * _mask(clean, clean_len) + pos_scaled + neg_scaled
    peak = jnp.max(jnp.abs(mixed), axis=-1, keepdims=True) + _EPS
    target = (clean * _mask(clean, clean_len) + pos_scaled) / peak
    return mixed / peak, target, pos_scaled / peak, neg_scaled / peak


def mix_one_noise(clean: jnp.ndarray, noise: jnp.ndarray,
                  clean_len, noise_len, snr
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Separator mixing (reference N_HANS___Source_Separation/reader.py:92-150).

    Returns (clean, noise*K, mixed/peak(mixed), K).  Note the asymmetry
    kept from the reference: only ``mixed`` is re-normalized by its own
    peak; clean and the scaled noise keep their per-file normalization
    (Source_Separation/reader.py:140-150).  ``K`` is returned so callers
    can scale the FULL-length interference signal for context crops — the
    reference's ``combine_signals`` returns ``noisesamples * K`` at its
    original length, not the clean-length-looped version
    (Source_Separation/reader.py:140-146)."""
    nse = loop_or_trim(noise, noise_len, clean_len)
    psig = _power(clean, clean_len)
    k = mixing_gains(psig, _power(nse, clean_len), snr)
    noise_scaled = k[..., None] * nse
    mixed = clean * _mask(clean, clean_len) + noise_scaled
    peak = jnp.max(jnp.abs(mixed), axis=-1, keepdims=True) + _EPS
    return clean * _mask(clean, clean_len), noise_scaled, mixed / peak, k


def snr_index_from_path(path, num_snrs: int, prefix_hex: int = 8) -> int:
    """Deterministic eval SNR selection: md5(cleanpath) hex prefix mod |SNRs|
    (reference reader.py:212-216).  ``prefix_hex=8`` for the positive noise,
    ``6`` for the negative noise.  Host-side (runs in the data loader)."""
    if isinstance(path, str):
        path = path.encode("utf-8")
    return int(hashlib.md5(path).hexdigest()[:prefix_hex], 16) % num_snrs
