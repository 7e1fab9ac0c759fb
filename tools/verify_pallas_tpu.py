"""Real-TPU gate for the fused Pallas spectrogram kernel.

Runs ON THE CHIP (not interpret mode): numeric parity vs the XLA
matmul-DFT path, plus micro-timings of both implementations and of the
end-to-end Enhancer with each ``stft_impl``.  Results are recorded in
docs/PROFILE.md.

Usage: python tools/verify_pallas_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    # jax.block_until_ready under-synchronizes through the axon tunnel;
    # force a host read of one element.
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, iters=20):
    fn(*args)  # compile
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import nhans_tpu.dsp.spectral as sp
    from nhans_tpu.ops.stft_pallas import pallas_log_spectrogram

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    assert backend == "tpu", "run this on the TPU chip"

    rng = np.random.default_rng(0)
    results = {}
    for B, L in ((4, 160000), (8, 163600), (1, 16000)):
        x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 3000)

        lm_p, re_p, im_p = pallas_log_spectrogram(x, with_reim=True)
        lm_x, ph_x = sp.spectrogram(x, impl="xla")
        lm_err = float(np.abs(np.asarray(lm_p) - np.asarray(lm_x)).max())
        mag = np.exp(np.asarray(lm_x))
        ph_p = np.arctan2(np.asarray(im_p), np.asarray(re_p))
        dph = np.angle(np.exp(1j * (ph_p - np.asarray(ph_x))))
        ph_err = float(np.abs(dph[mag > 0.01 * mag.max()]).max())
        print(f"[{B}x{L}] parity: max|dlogmag|={lm_err:.2e} "
              f"max|dphase(heavy)|={ph_err:.2e}")
        assert lm_err < 5e-3, lm_err
        assert ph_err < 5e-2, ph_err

        f_pal = jax.jit(lambda x: pallas_log_spectrogram(x))
        f_pal_ph = jax.jit(
            lambda x: pallas_log_spectrogram(x, with_reim=True))
        f_xla = jax.jit(lambda x: sp.log_spectrogram(x, impl="xla"))
        f_xla_ph = jax.jit(lambda x: sp.spectrogram(x, impl="xla"))
        t_pal = timeit(f_pal, x)
        t_xla = timeit(f_xla, x)
        t_pal_ph = timeit(f_pal_ph, x)
        t_xla_ph = timeit(f_xla_ph, x)
        print(f"[{B}x{L}] logmag: pallas {t_pal*1e3:.3f} ms vs xla "
              f"{t_xla*1e3:.3f} ms ({t_xla/t_pal:.2f}x); +phase: pallas "
              f"{t_pal_ph*1e3:.3f} ms vs xla {t_xla_ph*1e3:.3f} ms "
              f"({t_xla_ph/t_pal_ph:.2f}x)")
        results[(B, L)] = (t_pal, t_xla, t_pal_ph, t_xla_ph)

    # end-to-end enhancement RTF with each impl
    import dataclasses
    from nhans_tpu.config import Config
    from nhans_tpu.infer.enhance import Enhancer
    from nhans_tpu.models import init_variables

    seconds = 10.0
    B = 8
    wav = (rng.standard_normal((B, int(16000 * seconds))) * 3000)
    ctx = rng.standard_normal(32000) * 3000
    for impl in ("xla", "pallas"):
        cfg = Config.denoiser()
        cfg = cfg.replace(audio=dataclasses.replace(cfg.audio,
                                                    stft_impl=impl))
        _, variables = init_variables(cfg, jax.random.PRNGKey(0),
                                      train=False)
        enh = Enhancer(cfg, variables)
        enh.enhance_batch(list(wav), [ctx] * B, [ctx] * B)  # compile
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = enh.enhance_batch(list(wav), [ctx] * B, [ctx] * B)
        dt = (time.perf_counter() - t0) / iters
        rtf = B * seconds / dt
        print(f"enhancer[{impl}]: {dt*1e3:.1f} ms / batch of "
              f"{B}x{seconds:.0f}s -> RTF {rtf:.1f}x")
