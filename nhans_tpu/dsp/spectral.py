"""STFT / iSTFT with TensorFlow-`tf.signal` parity semantics, TPU-first.

The reference computes spectrograms with ``tf.signal.stft(x, 400, 160,
fft_length=400)`` (reference reader.py:334-337) and reconstructs with
``tf.signal.inverse_stft(..., window_fn=tf.signal.inverse_stft_window_fn(
160, hann))`` (reference main.py:280-283, apply.py:199).  This module
reproduces those semantics in pure JAX:

* periodic Hann analysis window,
* frames = 1 + (N - frame_length) // frame_step (no pad_end),
* synthesis window = hann / (periodic sum of squared overlapped hanns)
  — the canonical dual window of tf.signal.inverse_stft_window_fn,
* overlap-add reconstruction.

TPU fast path: a 400-point rFFT over many frames is expressed as two real
matmuls with precomputed DFT bases ([F,400] @ [400,201] for cos and sin).
This runs on the MXU systolic array, which beats the generic FFT lowering
for these small radix-mixed sizes and fuses with the downstream
log-magnitude elementwise ops.  ``method="fft"`` selects jnp.fft instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGH = jax.lax.Precision.HIGHEST


def hann_window(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (tf.signal.hann_window(periodic=True) parity)."""
    n = np.arange(length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)
    return jnp.asarray(w, dtype=dtype)


@functools.lru_cache(maxsize=8)
def _synthesis_window_np(frame_length: int, frame_step: int) -> np.ndarray:
    """TF inverse_stft_window_fn: hann / periodic sum of squared windows."""
    n = np.arange(frame_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / frame_length)
    denom = w * w
    overlaps = -(-frame_length // frame_step)  # ceil
    pad = overlaps * frame_step - frame_length
    denom = np.pad(denom, (0, pad))
    denom = denom.reshape(overlaps, frame_step).sum(axis=0)
    denom = np.tile(denom, overlaps)[:frame_length]
    return (w / denom).astype(np.float64)


def synthesis_window(frame_length: int, frame_step: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_synthesis_window_np(frame_length, frame_step), dtype)


@functools.lru_cache(maxsize=8)
def _dft_bases_np(frame_length: int, num_bins: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed forward rDFT bases. Returns (cos_basis, sin_basis), each
    [frame_length, num_bins], already multiplied by the Hann window so the
    framed signal multiplies straight onto the MXU."""
    n = np.arange(frame_length)[:, None]
    k = np.arange(num_bins)[None, :]
    ang = 2.0 * np.pi * n * k / frame_length
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_length) / frame_length))
    cos_b = np.cos(ang) * w[:, None]
    sin_b = -np.sin(ang) * w[:, None]
    return cos_b.astype(np.float64), sin_b.astype(np.float64)


@functools.lru_cache(maxsize=8)
def _idft_bases_np(frame_length: int, num_bins: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT bases. x[n] = Re(X) @ C + Im(X) @ S, each [num_bins,
    frame_length], with the 1/N and conjugate-symmetry doubling folded in."""
    k = np.arange(num_bins)[:, None]
    n = np.arange(frame_length)[None, :]
    ang = 2.0 * np.pi * k * n / frame_length
    scale = np.full((num_bins, 1), 2.0 / frame_length)
    scale[0] = 1.0 / frame_length
    if frame_length % 2 == 0:
        scale[-1] = 1.0 / frame_length
    cos_b = np.cos(ang) * scale
    sin_b = -np.sin(ang) * scale
    return cos_b.astype(np.float64), sin_b.astype(np.float64)


def num_frames(num_samples: int, frame_length: int = 400,
               frame_step: int = 160) -> int:
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // frame_step


def frame_signal(x: jnp.ndarray, frame_length: int = 400,
                 frame_step: int = 160) -> jnp.ndarray:
    """Slice a signal [..., T] into frames [..., F, frame_length].

    Matches tf.signal.frame(pad_end=False): drops the ragged tail.
    """
    t = x.shape[-1]
    f = num_frames(t, frame_length, frame_step)
    idx = (np.arange(f)[:, None] * frame_step + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft(x: jnp.ndarray, frame_length: int = 400, frame_step: int = 160,
         method: str = "matmul") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward STFT of [..., T] -> (real, imag), each [..., F, bins].

    Parity with tf.signal.stft(x, frame_length, frame_step,
    fft_length=frame_length) (reference reader.py:334-337).
    """
    bins = frame_length // 2 + 1
    frames = frame_signal(x, frame_length, frame_step)
    if method == "fft":
        w = hann_window(frame_length, frames.dtype)
        spec = jnp.fft.rfft(frames * w, n=frame_length, axis=-1)
        return jnp.real(spec).astype(frames.dtype), jnp.imag(spec).astype(frames.dtype)
    cos_np, sin_np = _dft_bases_np(frame_length, bins)
    cos_b = jnp.asarray(cos_np, frames.dtype)
    sin_b = jnp.asarray(sin_np, frames.dtype)
    re = jnp.matmul(frames, cos_b, precision=_HIGH)
    im = jnp.matmul(frames, sin_b, precision=_HIGH)
    return re, im


def log_magnitude(re: jnp.ndarray, im: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """log(|X| + eps) (reference reader.py:349)."""
    return jnp.log(jnp.sqrt(re * re + im * im) + eps)


def stft_magphase(x: jnp.ndarray, frame_length: int = 400,
                  frame_step: int = 160, method: str = "matmul"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(magnitude, phase) of the STFT."""
    re, im = stft(x, frame_length, frame_step, method)
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    return mag, phase


def resolve_stft_impl(impl: str = "auto") -> str:
    """Resolve "auto" to the fused Pallas kernel on TPU, XLA elsewhere
    (AudioConfig.stft_impl)."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _pallas_ok(x: jnp.ndarray, frame_length: int, frame_step: int) -> bool:
    """The fused kernel assumes <=2-D input and frame_length <= 3 hops
    (holds for the 25 ms / 10 ms contract)."""
    return x.ndim <= 2 and frame_length <= 3 * frame_step


def spectrogram(x: jnp.ndarray, frame_length: int = 400,
                frame_step: int = 160, eps: float = 1e-5,
                method: str = "matmul", impl: str = "xla"
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(log_magnitude, phase) — the model's input representation
    (reference reader.py:334-350).

    ``impl`` selects the backend: "xla" (gather + matmul-DFT, default),
    "pallas" (fused TPU kernel, nhans_tpu.ops.stft_pallas), or "auto".
    """
    lm, re, im = spectrogram_reim(x, frame_length, frame_step, eps,
                                  method, impl)
    return lm, jnp.arctan2(im, re)


def spectrogram_reim(x: jnp.ndarray, frame_length: int = 400,
                     frame_step: int = 160, eps: float = 1e-5,
                     method: str = "matmul", impl: str = "xla"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(log_magnitude, re, im).  Mixed-phase reconstruction only ever needs
    cos/sin of the phase, which are re/|X| and im/|X| — keeping re/im avoids
    arctan2 (no Mosaic lowering) AND the cos/sin round-trip."""
    if resolve_stft_impl(impl) == "pallas" and _pallas_ok(
            x, frame_length, frame_step):
        from nhans_tpu.ops.stft_pallas import pallas_log_spectrogram
        x2 = x[None] if x.ndim == 1 else x
        lm, re, im = pallas_log_spectrogram(
            x2.astype(jnp.float32), frame_length, frame_step, eps,
            with_reim=True)
        return (lm[0], re[0], im[0]) if x.ndim == 1 else (lm, re, im)
    re, im = stft(x, frame_length, frame_step, method)
    logmag = jnp.log(jnp.sqrt(re * re + im * im) + eps)
    return logmag, re, im


def log_spectrogram(x: jnp.ndarray, frame_length: int = 400,
                    frame_step: int = 160, eps: float = 1e-5,
                    method: str = "matmul", impl: str = "xla",
                    mesh=None, interpret: bool = False) -> jnp.ndarray:
    """Log-magnitude only (no phase) — what the training pipeline and the
    context encoders consume.  On the Pallas path this skips the arctan2
    entirely.

    ``mesh``: under a >1-device mesh, ``pallas_call`` has no SPMD
    partitioning rule, so the kernel is wrapped in ``shard_map`` over the
    ``data`` axis — utterance rows are embarrassingly parallel, each
    device runs the kernel on its local shard and the numerics are
    identical to the unsharded call (tests/test_pallas_ops.py)."""
    if resolve_stft_impl(impl) == "pallas" and _pallas_ok(
            x, frame_length, frame_step):
        from nhans_tpu.ops.stft_pallas import pallas_log_spectrogram
        x2 = x[None] if x.ndim == 1 else x

        def run(xs):
            return pallas_log_spectrogram(
                xs.astype(jnp.float32), frame_length, frame_step, eps,
                interpret=interpret)

        if mesh is not None and mesh.size > 1 and x2.ndim == 2:
            from jax.sharding import PartitionSpec as P
            # check_vma=False: pallas_call's out ShapeDtypeStruct carries
            # no varying-mesh-axes metadata, and per-shard independence
            # is structural here (each row is one utterance)
            run = jax.shard_map(run, mesh=mesh,
                                in_specs=P("data"),
                                out_specs=P("data"),
                                check_vma=False)
        lm = run(x2)
        return lm[0] if x.ndim == 1 else lm
    re, im = stft(x, frame_length, frame_step, method)
    return jnp.log(jnp.sqrt(re * re + im * im) + eps)


def overlap_add(frames: jnp.ndarray, frame_step: int = 160) -> jnp.ndarray:
    """Overlap-add [..., F, L] -> [..., frame_step*(F-1)+L].

    Scatter-free formulation: pad each frame to a whole number of hops,
    split into hop-sized chunks, and sum the (L//step)+1 shifted diagonals
    via static slices — no scatter-add, so XLA vectorizes it cleanly.
    """
    *lead, f, length = frames.shape
    chunks = -(-length // frame_step)  # ceil
    pad = chunks * frame_step - length
    padded = jnp.pad(frames, [(0, 0)] * len(lead) + [(0, 0), (0, pad)])
    padded = padded.reshape(*lead, f, chunks, frame_step)
    out_hops = f + chunks - 1
    total = jnp.zeros((*lead, out_hops, frame_step), padded.dtype)
    for j in range(chunks):
        # frame p's j-th chunk lands at hop p + j
        total = total.at[..., j:j + f, :].add(padded[..., :, j, :])
    out = total.reshape(*lead, out_hops * frame_step)
    want = frame_step * (f - 1) + length
    return out[..., :want]


def istft(re: jnp.ndarray, im: jnp.ndarray, frame_length: int = 400,
          frame_step: int = 160, method: str = "matmul") -> jnp.ndarray:
    """Inverse STFT of (real, imag) [..., F, bins] -> [..., T].

    Parity with tf.signal.inverse_stft(stft, frame_length, frame_step,
    frame_length, window_fn=tf.signal.inverse_stft_window_fn(frame_step))
    (reference main.py:280-283, apply.py:199).
    """
    bins = frame_length // 2 + 1
    if method == "fft":
        frames = jnp.fft.irfft(re + 1j * im, n=frame_length, axis=-1)
        frames = frames.astype(re.dtype)
    else:
        cos_np, sin_np = _idft_bases_np(frame_length, bins)
        cos_b = jnp.asarray(cos_np, re.dtype)
        sin_b = jnp.asarray(sin_np, re.dtype)
        frames = (jnp.matmul(re, cos_b, precision=_HIGH)
                  + jnp.matmul(im, sin_b, precision=_HIGH))
    syn = synthesis_window(frame_length, frame_step, frames.dtype)
    return overlap_add(frames * syn, frame_step)


def istft_from_logmag(logmag: jnp.ndarray, phase: jnp.ndarray,
                      frame_length: int = 400, frame_step: int = 160,
                      method: str = "matmul") -> jnp.ndarray:
    """Reconstruct a waveform from (log-magnitude, phase): exp -> complex ->
    iSTFT.  This is the reference's reconstruction recipe with the *mixed*
    phase (reference main.py:301-306, apply.py:189-204)."""
    mag = jnp.exp(logmag)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft(re, im, frame_length, frame_step, method)
