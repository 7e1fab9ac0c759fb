"""Phase-level timing of ONE interactive enhance call on the real chip.

Times, separately: host prep, each H2D transfer, context-program and
main-program dispatch+exec with device-resident args, D2H readback, and
no-op jit calls probing per-argument handle overhead through the remote
runtime (the motivation for parameter packing and the context-embedding
cache, infer/enhance.py).

Usage: python tools/profile_latency.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

AEX = "/root/reference/N_HANS___Selective_Noise/audio_examples"


def t(fn, iters=20):
    import jax
    out = fn()
    if out is not None:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        if out is not None:
            jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--aex", default=AEX)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from nhans_tpu.config import Config
    from nhans_tpu.infer.enhance import Enhancer, context_samples
    from nhans_tpu.models import init_variables
    from nhans_tpu.utils import wavio

    cfg = Config.denoiser()
    _, var = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, var)

    mixed = wavio.read_for_processing(os.path.join(args.aex, "exp2_noisy.wav"))
    silent = wavio.read_for_processing(os.path.join(args.aex, "Silent.wav"))
    noise = wavio.read_for_processing(os.path.join(args.aex, "exp2_noise.wav"))
    secs = len(mixed) / cfg.audio.sample_rate

    # full warm call (ctx cache HIT after the first call)
    full = t(lambda: enh.enhance(mixed, silent, noise)["denoised"][:1],
             iters=args.iters)
    print(f"audio: {secs:.2f}s   full warm call: {full:8.2f} ms "
          f"({secs * 1e3 / full:.1f}x RTF)")

    # cold-context call: clear the cache each iteration
    def cold():
        enh._ctx_cache.clear()
        return enh.enhance(mixed, silent, noise)["denoised"][:1]
    print(f"cold-context call       : {t(cold, args.iters):8.2f} ms")

    # host prep only
    ctx_n = context_samples(cfg)

    def prep():
        pw, n, pk = enh.prepare_wave(mixed)
        program, bucket = enh._program_for(n, 1)
        mix = np.zeros((1, bucket), np.int16)
        mix[0, :n] = pw
        ctx = np.zeros((1, 2, ctx_n), np.int16)
        for col, w in ((0, silent), (1, noise)):
            m = min(len(w), ctx_n)
            ctx[0, col, :m] = np.rint(w[:m]).astype(np.int16)
        return mix, ctx

    print(f"host prep (numpy)       : {t(lambda: (prep(), None)[1], args.iters):8.2f} ms")

    mix, ctx = prep()
    ints = np.zeros((1, 5), np.int32)
    ints[0] = (len(mix[0]), len(silent), min(len(noise), ctx_n), 0, 10 ** 9)
    peaks = np.asarray([[np.max(np.abs(mixed)), 1.0,
                         np.max(np.abs(noise))]], np.float32)

    for name, arr in (("mixed", mix), ("ctx", ctx)):
        print(f"H2D {name:6s} {arr.nbytes / 1024:7.1f} KB : "
              f"{t(lambda a=arr: jnp.asarray(a), args.iters):8.2f} ms")

    emb_a, emb_b = enh._encode_contexts(ctx, ints, peaks)
    print(f"ctx program (cache miss): "
          f"{t(lambda: (enh._ctx_cache.clear(), enh._encode_contexts(ctx, ints, peaks)[0])[1], args.iters):8.2f} ms")

    pw, n, pk = enh.prepare_wave(mixed)
    program, bucket = enh._program_for(n, 1)
    F = enh.cfg.audio.num_frames(bucket)
    ints2 = np.asarray([[n, 0, 0, 0, F]], np.int32)
    d_mix = jnp.asarray(mix)
    d_ints = jnp.asarray(ints2)
    d_peaks = jnp.asarray(peaks)

    def ex():
        return program(enh._param_args, emb_a, emb_b, d_mix, d_ints,
                       d_peaks)[1]
    print(f"main program (dev args) : {t(ex, args.iters):8.2f} ms")

    outs = program(enh._param_args, emb_a, emb_b, d_mix, d_ints, d_peaks)
    print(f"D2H wavs {outs[0].nbytes / 1024:7.1f} KB: "
          f"{t(lambda: (np.asarray(outs[0]), None)[1], args.iters):8.2f} ms")

    # handle-count probes: no-op jit with the raw pytree (~600 leaves) vs
    # the packed args (1-2 leaves)
    noop = jax.jit(lambda v, x: x + 1)
    d1 = jnp.zeros((8,), jnp.float32)
    print(f"noop jit (raw pytree)   : {t(lambda: noop(enh.variables, d1), args.iters):8.2f} ms")
    noop2 = jax.jit(lambda v, x: x + 1)
    print(f"noop jit (packed args)  : {t(lambda: noop2(enh._param_args, d1), args.iters):8.2f} ms")
    noop3 = jax.jit(lambda x: x + 1)
    print(f"noop jit (1 scalar arg) : {t(lambda: noop3(d1), args.iters):8.2f} ms")
    print(f"D2H tiny (8 f32)        : {t(lambda: (np.asarray(d1), None)[1], args.iters):8.2f} ms")


if __name__ == "__main__":
    main()
