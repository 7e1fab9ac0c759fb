"""Fused Pallas TPU kernel: waveform -> log-magnitude spectrogram.

One kernel per (batch row, frame tile): DMA the needed hop-major waveform
span from HBM into VMEM and evaluate the windowed rDFT as three shifted
MXU matmuls against zero-padded [256, 402] cos|sin basis blocks (frame m =
hop m | hop m+1 | head of hop m+2, since 400 = 2*160 + 80), fusing
magnitude+log (and optionally phase) on the VPU.  The framed signal never
materializes in HBM and no lane-misaligned slice/concat is needed
in-kernel.

This is the TPU-native replacement for the reference's delegated
``tf.signal.stft`` C++ kernel (reference reader.py:334-337); the pure-XLA
fallback lives in nhans_tpu.dsp.spectral, and
``dsp.spectral.spectrogram(..., impl=...)`` dispatches between the two
(config: ``AudioConfig.stft_impl``).  Parity + speed on real TPU hardware
are covered by tests/test_pallas_ops.py::test_pallas_real_tpu_parity and
``bench.py --stft_impl``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nhans_tpu.dsp.spectral import _dft_bases_np, num_frames


@functools.partial(jax.jit, static_argnames=("frame_length", "frame_step",
                                             "eps", "tile", "interpret",
                                             "with_reim"))
def pallas_log_spectrogram(x: jnp.ndarray, frame_length: int = 400,
                           frame_step: int = 160, eps: float = 1e-5,
                           tile: int = 256,
                           interpret: bool = False,
                           with_reim: bool = False):
    """[B, L] float32 -> [B, F, bins] log-magnitude, F = num_frames(L);
    with ``with_reim`` also returns the raw [B, F, bins] (re, im) STFT so
    callers can derive phase (or, better, cos/sin of it as re/|X|, im/|X|
    — Mosaic has no atan2 lowering, and the reconstruction only ever needs
    cos/sin) without a second pass over the waveform.

    Requires frame_length == 2*frame_step + frame_step//2 style geometry?
    No — only frame_length <= 3*frame_step is assumed (400 <= 480), which
    holds for the 25 ms / 10 ms contract.
    """
    assert x.ndim == 2
    B, L = x.shape
    bins = frame_length // 2 + 1
    F = num_frames(L, frame_length, frame_step)
    if F == 0:
        z = jnp.zeros((B, 0, bins), x.dtype)
        return (z, z, z) if with_reim else z
    nt = -(-F // tile)
    Fpad = nt * tile
    # span per tile: (tile + 2) hops of frame_step covers
    # (tile - 1)*step + frame_length samples (with slack); the waveform is
    # viewed hop-major [B, hops, step] so tile spans are 2-D DMA slices
    span_hops = tile + 8  # tile+2 needed; +8 keeps the DMA sublane-aligned
    need_hops = (nt - 1) * tile + span_hops
    need_hops += (-need_hops) % 8  # row starts stay sublane-aligned
    need = need_hops * frame_step
    xpad = jnp.pad(x, ((0, 0), (0, max(0, need - L))))
    # hop-major 2-D layout [B*hops, lane] with the lane dim padded to a
    # multiple of 128 so tile spans are pure leading-dim DMA slices
    lane = -(-frame_step // 128) * 128  # 160 -> 256
    xpad = xpad[:, :need].reshape(B * need_hops, frame_step)
    xpad = jnp.pad(xpad, ((0, 0), (0, lane - frame_step)))

    # Windowed rDFT basis split into three hop-aligned blocks, each padded
    # to [lane, 2*bins] with zero rows, so the kernel never lane-slices:
    # frame m = [hop m | hop m+1 | first `rem` samples of hop m+2].
    cos_np, sin_np = _dft_bases_np(frame_length, bins)
    full = np.concatenate([cos_np, sin_np], axis=1)  # [400, 402]
    rem = frame_length - 2 * frame_step              # 80
    blocks = np.zeros((3, lane, 2 * bins), np.float32)
    blocks[0, :frame_step] = full[:frame_step]
    blocks[1, :frame_step] = full[frame_step:2 * frame_step]
    blocks[2, :rem] = full[2 * frame_step:]
    basis = jnp.asarray(blocks)

    def kernel(x_ref, basis_ref, *out_refs):
        out_ref = out_refs[0]
        span_ref, sem = out_refs[-2], out_refs[-1]
        b = pl.program_id(0)
        t = pl.program_id(1)
        start = b * need_hops + t * tile
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(start, span_hops)], span_ref, sem)
        cp.start()
        cp.wait()
        spr = span_ref[:]
        # frame m = hops m, m+1 and the head of m+2; the basis blocks are
        # zero-padded so the three shifted matmuls sum to the full rDFT
        # without any lane slicing/concat in-kernel.
        prod = (
            jnp.dot(spr[:tile], basis_ref[0],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(spr[1:tile + 1], basis_ref[1],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(spr[2:tile + 2], basis_ref[2],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        )
        re = prod[:, :bins]
        im = prod[:, bins:]
        out_ref[0] = jnp.log(jnp.sqrt(re * re + im * im) + eps)
        if with_reim:
            out_refs[1][0] = re
            out_refs[2][0] = im

    spec = pl.BlockSpec((1, tile, bins), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, Fpad, bins), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # waveform stays in HBM
            pl.BlockSpec((3, lane, 2 * bins),
                         lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # DFT basis resident
        ],
        out_specs=(spec, spec, spec) if with_reim else spec,
        out_shape=(shape, shape, shape) if with_reim else shape,
        scratch_shapes=[
            pltpu.VMEM((span_hops, lane), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, basis)
    if with_reim:
        return out[0][:, :F], out[1][:, :F], out[2][:, :F]
    return out[:, :F]
