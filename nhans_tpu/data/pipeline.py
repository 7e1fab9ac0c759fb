"""On-device batch construction: mixing -> STFT -> random synchronized
crops, all inside jit.

The reference does this on 16 host threads through ``tf.py_func`` numpy
mixing + in-graph STFT + queues (reference reader.py:287-397), then copies
every batch host->device.  Here the host loader only decodes wavs into
fixed-size padded buffers; everything signal-shaped happens on the TPU as
part of the (pjit-able) step, keeping the MXU fed.

Shapes are static: waveform buffers [B, L] with valid lengths [B]; the
spectrogram has F = num_frames(L) frames of which ``nf[b]`` are valid.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nhans_tpu.config import Config
from nhans_tpu.dsp import mixing as mx
from nhans_tpu.dsp import spectral as sp


def _whole_frames(n, frame_length: int, frame_step: int):
    """Trim a (dynamic) length to a whole number of frames
    (reference reader.py:195-198)."""
    return n - jnp.remainder(jnp.maximum(n - frame_length, 0), frame_step)


def _valid_frames(n, frame_length: int, frame_step: int):
    return 1 + jnp.maximum(n - frame_length, 0) // frame_step


def make_train_batch(cfg: Config, key: jax.Array, clean: jnp.ndarray,
                     noise_a: jnp.ndarray, noise_b: jnp.ndarray,
                     clean_len: jnp.ndarray, len_a: jnp.ndarray,
                     len_b: jnp.ndarray,
                     slices: Optional[int] = None,
                     peaks: Optional[jnp.ndarray] = None,
                     stft_impl: Optional[str] = None,
                     mesh=None) -> Dict[str, jnp.ndarray]:
    """Build a training minibatch from raw waveform buffers.

    For the denoiser task, ``noise_a``/``noise_b`` are the positive and
    negative noise recordings; for the separator they are (interference
    speaker, ignored) — the separator draws both signals from the speech
    corpus and ``noise_b`` is unused (reference
    Source_Separation/reader.py:248-249 dequeues the speech queue twice).

    Returns mixed windows [N, W, F], target central frames [N, F] and the
    two conditioning contexts [N, C, F] with N = B * slices.
    """
    a, m, task = cfg.audio, cfg.model, cfg.task
    fl, fs = a.frame_length, a.frame_step
    K = int(slices or cfg.data.slices_per_step)
    B, L = clean.shape
    W, C = m.window_frames, m.context_frames
    pad_before = ((W + 1) // 2) - 1

    (k_snr_a, k_snr_b, k_win, k_ctx_a, k_ctx_b,
     k_aug_a, k_aug_b) = jax.random.split(key, 7)

    # accept int16 wire format (loader transfer_dtype) — cast on device
    clean = clean.astype(jnp.float32)
    noise_a = noise_a.astype(jnp.float32)
    noise_b = noise_b.astype(jnp.float32)

    # Statically align noise buffers to the speech wire length: the
    # device-resident banks pad each corpus to ITS OWN longest file, so
    # a noise corpus longer than the speech bucket (or vice versa)
    # otherwise shape-errors in mixing.  Longer: keep the first L
    # samples and clamp the valid length (the mixer loops/trims to
    # clean_len anyway, reference reader.py:132-144); shorter: zero-pad
    # (loop_or_trim cycles within the valid length, padding is inert).
    def _fit(noise, nlen):
        # int32 on every branch so the jitted input signature (and the
        # compile-cache entry) is branch-independent for identical data
        nlen = jnp.asarray(nlen, jnp.int32)
        nL = noise.shape[-1]
        if nL > L:
            return noise[..., :L], jnp.minimum(nlen, L)
        if nL < L:
            return jnp.pad(noise, ((0, 0), (0, L - nL))), nlen
        return noise, nlen

    noise_a, len_a = _fit(noise_a, len_a)
    noise_b, len_b = _fit(noise_b, len_b)

    if cfg.data.augment_noise and task.two_noise_mixing:
        # on-device noise augmentation (no reference counterpart —
        # documented divergence, docs/PARITY.md): random circular shift,
        # time reversal and polarity of each noise recording multiply the
        # effective diversity of small noise corpora.  Peak-invariant, so
        # the host-computed whole-file peaks stay valid.
        def aug(x, n, kk):
            ks, kr, kp = jax.random.split(kk, 3)
            n = jnp.maximum(jnp.asarray(n, jnp.int32), 1)
            shift = jax.random.randint(ks, (B,), 0, 1 << 30) % n
            rev = jax.random.bernoulli(kr, shape=(B,))
            sign = jnp.where(jax.random.bernoulli(kp, shape=(B,)),
                             1.0, -1.0).astype(x.dtype)
            ar = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :]
            fwd = jnp.remainder(shift[:, None] + ar, n[:, None])
            bwd = jnp.remainder(shift[:, None] - ar, n[:, None])
            idx = jnp.where(rev[:, None], bwd, fwd)
            out = jnp.take_along_axis(x, idx, axis=-1)
            mask = (ar < n[:, None]).astype(x.dtype)
            return out * mask * sign[:, None]

        noise_a = aug(noise_a, len_a, k_aug_a)
        noise_b = aug(noise_b, len_b, k_aug_b)

    # --- normalize + trim (reference reader.py:186-198); peaks [B, 3],
    # when provided by the loader, are the whole-file maxima (see loader)
    pk = (lambda i: peaks[:, i] if peaks is not None else None)
    clean_len = _whole_frames(clean_len, fl, fs)
    clean = mx.peak_normalize(clean, clean_len, pk(0))
    noise_a = mx.peak_normalize(noise_a, len_a, pk(1))

    snr_vals = list(task.snr_set)
    if cfg.data.snr_augment:
        # extended TRAIN-only SNR range: near-clean mixtures teach the
        # identity mapping on already-clean input (eval keeps the
        # reference's md5-deterministic base-set draws)
        snr_vals = snr_vals + [12, 18, 30]
    snr_set = jnp.asarray(snr_vals, jnp.float32)
    snr_a = snr_set[jax.random.randint(k_snr_a, (B,), 0, len(snr_vals))]
    snr_b = snr_set[jax.random.randint(k_snr_b, (B,), 0, len(snr_vals))]

    if task.two_noise_mixing:
        noise_b = mx.peak_normalize(noise_b, len_b, pk(2))
        mixed, target, pos_s, neg_s = mx.mix_two_noise(
            clean, noise_a, noise_b, clean_len, len_a, len_b, snr_a, snr_b)
        ctx_src_a, ctx_src_b = pos_s, neg_s
        ctx_len_a = ctx_len_b = clean_len
    else:
        tgt, noise_scaled, mixed, k = mx.mix_one_noise(
            clean, noise_a, clean_len, len_a, snr_a)
        target = tgt
        # separator contexts: interference speaker at its FULL length
        # (reference combine_signals returns noisesamples*K un-looped,
        # Source_Separation/reader.py:140-146), target speaker
        # (reference Source_Separation/reader.py:344-357)
        ctx_src_a = k[..., None] * noise_a
        ctx_src_b = tgt
        ctx_len_a, ctx_len_b = len_a, clean_len

    # --- spectrograms (log-magnitude only; training never uses phase —
    # the Pallas path never computes it)
    impl = sp.resolve_stft_impl(stft_impl if stft_impl is not None
                                else a.stft_impl)
    lm_mixed = sp.log_spectrogram(mixed, fl, fs, a.log_eps, impl=impl,
                                  mesh=mesh)
    lm_target = sp.log_spectrogram(target, fl, fs, a.log_eps, impl=impl,
                                   mesh=mesh)
    lm_ctx_a = sp.log_spectrogram(ctx_src_a, fl, fs, a.log_eps, impl=impl,
                                  mesh=mesh)
    lm_ctx_b = sp.log_spectrogram(ctx_src_b, fl, fs, a.log_eps, impl=impl,
                                  mesh=mesh)
    F = lm_mixed.shape[1]
    nf = _valid_frames(clean_len, fl, fs)                     # [B]
    nf_ctx_a = _valid_frames(ctx_len_a, fl, fs)
    nf_ctx_b = _valid_frames(ctx_len_b, fl, fs)

    # --- zero frames beyond the valid region: the reference computes
    # spectrograms of EXACT length and zero-pads for windowing
    # (reader.py:352-356, pad_1D_for_windowing), while our static buffers
    # hold log(eps) there from the zero-padded waveform tail.
    far = jnp.arange(F, dtype=jnp.int32)[None, :, None]

    def zero_tail(lm, n_valid):
        return lm * (far < n_valid[:, None, None]).astype(lm.dtype)

    lm_mixed = zero_tail(lm_mixed, nf)
    lm_target = zero_tail(lm_target, nf)
    lm_ctx_a = zero_tail(lm_ctx_a, nf_ctx_a)
    lm_ctx_b = zero_tail(lm_ctx_b, nf_ctx_b)

    # --- pad the frame axis for windowing (reference reader.py:352-356)
    def pad(x):
        return jnp.pad(x, ((0, 0), (pad_before, W // 2), (0, 0)))

    lm_mixed_p = pad(lm_mixed)
    lm_ctx_a_p = pad(lm_ctx_a)
    lm_ctx_b_p = pad(lm_ctx_b)

    # --- synchronized random crops (reference reader.py:433-489)
    # winstart in [0, nf_padded - W] == [0, nf - 1] of padded coords
    u = jax.random.uniform(k_win, (B, K))
    winstart = (u * nf[:, None].astype(u.dtype)).astype(jnp.int32)  # [B,K]

    widx = winstart[..., None] + jnp.arange(W)[None, None, :]  # [B,K,W]
    mixed_win = jnp.take_along_axis(
        lm_mixed_p[:, None], widx[..., None], axis=2)          # [B,K,W,nfeat]
    # target = central frame of the PADDED window (reference
    # synchronized_1D_crop takes cropped[W // 2]), mapped back to original
    # coords: winstart + W//2 - pad_before.  For odd W this is exactly
    # `winstart`; for even W the center is shifted by one.
    center = winstart + (W // 2) - pad_before
    tidx = jnp.clip(center, 0, jnp.maximum(nf[:, None] - 1, 0))
    target_c = jnp.take_along_axis(
        lm_target, tidx[..., None], axis=1)                    # [B,K,nfeat]

    # contexts: C consecutive padded frames from the "rest" (window excised
    # at `winstart`), rest length = nf_src + W - 1 - W = nf_src - 1.  Each
    # context source uses its OWN frame count (the separator's interference
    # context is a full-length signal, possibly longer/shorter than clean).
    def ctx_crop(lm_p, kk, nf_src):
        rest_max = jnp.maximum(nf_src[:, None] - 1 - C, 0)     # [B,1]
        r = (jax.random.uniform(kk, (B, K)) *
             (rest_max + 1).astype(jnp.float32)).astype(jnp.int32)
        idx = r[..., None] + jnp.arange(C)[None, None, :]      # [B,K,C]
        idx = idx + jnp.where(idx >= winstart[..., None], W, 0)
        # utterances with fewer than C+1 valid frames have no C-frame
        # rest to cut: tile the REAL frames cyclically instead, the
        # same convention inference uses (infer/enhance.py context
        # tiling).  The reference ERRORS on such inputs (reader.py:
        # 481-487, uniform over an empty range), so matching inference
        # keeps train/apply context statistics identical.
        short = (nf_src[:, None, None] - 1) < C                # [B,1,1]
        idx_short = pad_before + (jnp.arange(C)[None, None, :]
                                  % jnp.maximum(nf_src, 1)[:, None, None])
        idx = jnp.where(short, idx_short, idx)
        idx = jnp.minimum(idx, F + W - 2)                      # stay in buffer
        return jnp.take_along_axis(lm_p[:, None], idx[..., None], axis=2)

    ctx_a = ctx_crop(lm_ctx_a_p, k_ctx_a, nf_ctx_a)            # [B,K,C,nfeat]
    ctx_b = ctx_crop(lm_ctx_b_p, k_ctx_b, nf_ctx_b)

    nfeat = m.num_features
    return {
        "mixed": mixed_win.reshape(B * K, W, nfeat),
        "target": target_c.reshape(B * K, nfeat),
        "ctx_a": ctx_a.reshape(B * K, C, nfeat),
        "ctx_b": ctx_b.reshape(B * K, C, nfeat),
        "snr_a": jnp.repeat(snr_a, K),
        "snr_b": jnp.repeat(snr_b, K),
    }


def make_eval_batch(cfg: Config, mixed: jnp.ndarray, target: jnp.ndarray,
                    ctx_a_sig: jnp.ndarray, ctx_b_sig: jnp.ndarray,
                    n: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Deterministic eval windows for ONE utterance (batch dims of 1 kept).

    Reference semantics (reader.py:398-420): the first ``context_frames``
    frames provide the conditioning contexts; the model is evaluated on
    every frame position (stride 1) of the remainder.
    """
    a, m = cfg.audio, cfg.model
    fl, fs = a.frame_length, a.frame_step
    W, C = m.window_frames, m.context_frames
    pad_before = ((W + 1) // 2) - 1

    lm_mixed, ph_mixed = sp.spectrogram(mixed, fl, fs, a.log_eps)
    lm_target, _ = sp.spectrogram(target, fl, fs, a.log_eps)
    lm_a, _ = sp.spectrogram(ctx_a_sig, fl, fs, a.log_eps)
    lm_b, _ = sp.spectrogram(ctx_b_sig, fl, fs, a.log_eps)

    nf = _valid_frames(_whole_frames(n, fl, fs), fl, fs)
    F = lm_mixed.shape[-2]
    # windows over frames [C:], one per frame (stride 1)
    rest = lm_mixed[..., C:, :]
    padded = jnp.pad(rest, [(0, 0)] * (rest.ndim - 2)
                     + [(pad_before, W // 2), (0, 0)])
    nwin = F - C
    idx = np.arange(nwin)[:, None] + np.arange(W)[None, :]
    windows = padded[..., idx, :]
    valid = (jnp.arange(nwin) < (nf - C))
    return {
        "mixed": windows,
        "target": lm_target[..., C:, :],
        "mixed_lm": lm_mixed[..., C:, :],
        "mixed_ph": ph_mixed[..., C:, :],
        "ctx_a": lm_a[..., :C, :],
        "ctx_b": lm_b[..., :C, :],
        "valid": valid,
        "num_windows": jnp.maximum(nf - C, 0),
    }
