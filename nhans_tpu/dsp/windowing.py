"""Frame-axis windowing: padding, sliding windows, rest-crop indexing.

Replaces the reference's ``pad_1D_for_windowing`` (reference
reader.py:422-431), ``strided_crop`` via ``tf.extract_image_patches``
(reader.py:491-501), and the concat-based "rest" context cropping inside
``synchronized_1D_crop`` (reader.py:474-487) with gather-based, static-shape
formulations that XLA tiles efficiently.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pad_amounts(length: int) -> tuple:
    """(before, after) padding for a sliding window of ``length`` centered on
    each frame: ((length+1)//2 - 1, length//2) (reference reader.py:429-430)."""
    return ((length + 1) // 2) - 1, length // 2


def pad_for_windowing(x: jnp.ndarray, length: int, axis: int = -2) -> jnp.ndarray:
    """Pad the frame axis so every original frame can be a window center."""
    before, after = pad_amounts(length)
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (before, after)
    return jnp.pad(x, pads)


def strided_windows(x: jnp.ndarray, length: int, stride: int = 1) -> jnp.ndarray:
    """All sliding windows of a [T, F] spectrogram -> [N, length, F].

    Pads first (pad_for_windowing), so N = (T + length - 1 - length)//stride
    + 1 = ceil(T/stride) for stride 1: one window per original frame.
    Parity with the reference's extract_image_patches ``strided_crop``
    (reference reader.py:491-501, apply.py:176-186).
    """
    padded = pad_for_windowing(x, length, axis=0)
    n = (padded.shape[0] - length) // stride + 1
    idx = np.arange(n)[:, None] * stride + np.arange(length)[None, :]
    return padded[idx]


def window_gather_indices(num_windows: int, length: int, stride: int = 1) -> np.ndarray:
    """Static gather index matrix [num_windows, length] into a padded
    spectrogram (for building windows inside a jitted program)."""
    return np.arange(num_windows)[:, None] * stride + np.arange(length)[None, :]


def rest_crop_indices(start, context_len: int, winstart, winlength: int):
    """Indices selecting ``context_len`` consecutive frames from the
    "rest" — the spectrogram with frames [winstart, winstart+winlength)
    removed (reference reader.py:474-487).

    Equivalent to ``concat(x[:winstart], x[winstart+winlength:])[start:
    start+context_len]`` without materializing the concat: indices past
    ``winstart`` skip the excised window.
    """
    idx = jnp.asarray(start) + jnp.arange(context_len, dtype=jnp.int32)
    return idx + jnp.where(idx >= jnp.asarray(winstart), winlength, 0)
