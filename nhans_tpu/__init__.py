"""N-HANS/TPU — a TPU-native neuro-holistic audio-enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the N-HANS
toolkit (speech denoising, selective noise suppression, and speech source
separation; see reference README.md:11), designed TPU-first:

* all DSP (STFT/iSTFT/mixing/windowing) is jit-compiled XLA with an
  MXU-friendly DFT-by-matmul fast path (``nhans_tpu.dsp``),
* one conditional-ResNet model family with two task configs
  (``nhans_tpu.nn``, ``nhans_tpu.models``),
* a host data loader that only does wav IO; augmentation/mixing/STFT/crops
  run on-device inside the jitted train step (``nhans_tpu.data``),
* pjit/shard_map data-parallel training over a ``jax.sharding.Mesh``
  (``nhans_tpu.parallel``, ``nhans_tpu.train``),
* whole-utterance enhancement as a single XLA program (``nhans_tpu.infer``),
* CLI entry points keeping the reference's documented flags
  (``nhans_tpu.cli``).
"""

from nhans_tpu.version import __version__

__all__ = ["__version__"]
