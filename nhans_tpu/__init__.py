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

import os as _os


def _apply_platform_override() -> None:
    """Honor ``NHANS_PLATFORM`` (e.g. ``cpu``) before backend init.

    Operational necessity on hosts where a platform *plugin* (like a
    remote-TPU tunnel) wins over the standard ``JAX_PLATFORMS`` env var:
    running any tool against the accelerator while a training process
    owns it serializes both and can wedge the tunnel.  Setting
    ``NHANS_PLATFORM=cpu`` pins this process to CPU the supported way —
    ``jax.config.update`` at package import, before any backend exists.
    No-op when unset.
    """
    plat = _os.environ.get("NHANS_PLATFORM", "").strip()
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - best-effort, like the cache
        pass


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (safe no-op if unavailable).

    TPU compiles of the full model are expensive — especially through
    remote-compile tunnels — and every CLI invocation would otherwise pay
    them again.  Honors JAX_COMPILATION_CACHE_DIR if the user set one.
    """
    try:
        import jax
        if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            d = _os.path.join(_os.path.expanduser("~"), ".cache",
                              "nhans_tpu_jax")
            _os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
        # Cache even sub-second compiles: through remote-compile tunnels
        # every tiny eager op costs ~0.4 s, which adds up across a session.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_apply_platform_override()
_enable_compilation_cache()

from nhans_tpu.version import __version__  # noqa: E402

__all__ = ["__version__"]
