"""Signal-processing core: pure-JAX, jit-compiled, TPU-first.

Replaces the reference's delegation to TensorFlow's C++ ``tf.signal``
kernels (reference reader.py:334-350, main.py:276-283) with XLA-compiled
equivalents, including an MXU-friendly DFT-by-matmul fast path.
"""

from nhans_tpu.dsp.spectral import (
    hann_window,
    synthesis_window,
    frame_signal,
    stft,
    stft_magphase,
    log_magnitude,
    spectrogram,
    istft,
    istft_from_logmag,
    overlap_add,
)
from nhans_tpu.dsp.mixing import (
    peak_normalize,
    loop_or_trim,
    mixing_gains,
    mix_two_noise,
    mix_one_noise,
    snr_index_from_path,
)
from nhans_tpu.dsp.windowing import (
    pad_for_windowing,
    strided_windows,
    rest_crop_indices,
)

__all__ = [
    "hann_window", "synthesis_window", "frame_signal", "stft",
    "stft_magphase", "log_magnitude", "spectrogram", "istft",
    "istft_from_logmag", "overlap_add",
    "peak_normalize", "loop_or_trim", "mixing_gains", "mix_two_noise",
    "mix_one_noise", "snr_index_from_path",
    "pad_for_windowing", "strided_windows", "rest_crop_indices",
]
