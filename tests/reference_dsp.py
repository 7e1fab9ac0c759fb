"""Independent, loop-based numpy implementations of the tf.signal semantics
the reference relies on (tf.signal.stft / inverse_stft /
inverse_stft_window_fn) and of the reference's numpy mixing math
(reference reader.py:118-224).  Used as the parity oracle for
nhans_tpu.dsp — deliberately written in the most literal way possible.
"""

import numpy as np


def hann_periodic(n):
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft_ref(x, frame_length=400, frame_step=160):
    """tf.signal.stft(x, frame_length, frame_step, fft_length=frame_length)."""
    x = np.asarray(x, np.float64)
    if len(x) < frame_length:
        return np.zeros((0, frame_length // 2 + 1), np.complex128)
    nf = 1 + (len(x) - frame_length) // frame_step
    w = hann_periodic(frame_length)
    out = np.empty((nf, frame_length // 2 + 1), np.complex128)
    for m in range(nf):
        seg = x[m * frame_step:m * frame_step + frame_length] * w
        out[m] = np.fft.rfft(seg, n=frame_length)
    return out


def inverse_stft_window_ref(frame_length=400, frame_step=160):
    """tf.signal.inverse_stft_window_fn(frame_step, hann_periodic)."""
    w = hann_periodic(frame_length)
    denom = w ** 2
    overlaps = -(-frame_length // frame_step)
    denom = np.pad(denom, (0, overlaps * frame_step - frame_length))
    denom = denom.reshape(overlaps, frame_step).sum(axis=0)
    denom = np.tile(denom, overlaps)[:frame_length]
    return w / denom


def istft_ref(spec, frame_length=400, frame_step=160):
    """tf.signal.inverse_stft with the inverse_stft_window_fn window."""
    spec = np.asarray(spec)
    nf = spec.shape[0]
    syn = inverse_stft_window_ref(frame_length, frame_step)
    out = np.zeros(frame_step * (nf - 1) + frame_length, np.float64)
    for m in range(nf):
        frame = np.fft.irfft(spec[m], n=frame_length) * syn
        out[m * frame_step:m * frame_step + frame_length] += frame
    return out


def domixing_ref(clean, pos, neg, snr_pos, snr_neg):
    """Literal port of the reference's two-noise domixing semantics
    (reference reader.py:128-176) as the mixing oracle."""
    nse_pos, nse_neg = pos, neg
    while len(clean) - len(nse_pos) > 0:
        diff = len(clean) - len(nse_pos)
        nse_pos = np.concatenate([nse_pos, pos[:diff]])
    while len(clean) - len(nse_neg) > 0:
        diff = len(clean) - len(nse_neg)
        nse_neg = np.concatenate([nse_neg, neg[:diff]])
    if len(clean) - len(pos) < 0:
        nse_pos = pos[:len(clean)]
    if len(clean) - len(neg) < 0:
        nse_neg = neg[:len(clean)]
    sig = clean
    psignal = np.sum(np.abs(sig) ** 2) / sig.shape[0]
    ppos = np.sum(np.abs(nse_pos) ** 2) / nse_pos.shape[0]
    pneg = np.sum(np.abs(nse_neg) ** 2) / nse_neg.shape[0]
    k_pos = 1.0 if ppos == 0 else np.sqrt(psignal / ppos * 10 ** (-snr_pos / 10.0))
    k_neg = 1.0 if pneg == 0 else np.sqrt(psignal / pneg * 10 ** (-snr_neg / 10.0))
    pos_scaled = k_pos * nse_pos
    neg_scaled = k_neg * nse_neg
    mixed = sig + pos_scaled + neg_scaled
    peak = np.max(np.abs(mixed)) + 1e-6
    return (mixed / peak, (sig + pos_scaled) / peak,
            pos_scaled / peak, neg_scaled / peak)


def domixing_one_ref(clean, noise, snr):
    """Single-noise separator mixing oracle
    (reference N_HANS___Source_Separation/reader.py:92-117)."""
    nse = noise
    while len(clean) - len(nse) > 0:
        diff = len(clean) - len(nse)
        nse = np.concatenate([nse, noise[:diff]])
    if len(clean) - len(noise) < 0:
        nse = noise[:len(clean)]
    psignal = np.sum(np.abs(clean) ** 2) / clean.shape[0]
    pnoise = np.sum(np.abs(nse) ** 2) / nse.shape[0]
    k = 1.0 if pnoise == 0 else np.sqrt(psignal / pnoise * 10 ** (-snr / 10.0))
    noise_scaled = k * nse
    mixed = clean + noise_scaled
    mixed = mixed / (np.max(np.abs(mixed)) + 1e-6)
    return clean, noise_scaled, mixed
