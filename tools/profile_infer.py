"""Component-level timing of the inference path on the attached TPU:
spectrogram / context towers / windowed main tower / iSTFT, timed as
separate jitted programs, plus the fused full program for comparison.

Usage: python tools/profile_infer.py [--batch 16] [--seconds 10]
       [--chunk 1024] [--dtype bfloat16]
"""

import argparse
import time

import numpy as np
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    # block_until_ready under-synchronizes through the axon remote tunnel;
    # a host read of one element is the only reliable fence.
    import jax
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def timeit(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from nhans_tpu.config import Config
    from nhans_tpu.dsp import spectral as sp
    from nhans_tpu.models import init_variables
    from nhans_tpu.nn.model import NHANSNet

    cfg = Config.denoiser()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype=args.dtype))
    model, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)

    B = args.batch
    L = int(args.seconds * 16000)
    F = sp.num_frames(L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((B, 200, 201)).astype(np.float32))
    WC = args.chunk

    spec = jax.jit(lambda v: sp.spectrogram(v))
    t_spec = timeit(spec, x)
    print(f"spectrogram [B={B},L={L}]          : {t_spec*1e3:8.2f} ms")

    enc = jax.jit(lambda vv, c: model.apply(vv, None, c, c, False))
    t_enc = timeit(enc, variables, ctx)
    print(f"context towers (2x per utt)        : {t_enc*1e3:8.2f} ms")

    win = jnp.asarray(rng.standard_normal((WC, 35, 201)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((WC, 512)).astype(np.float32))
    tower = jax.jit(lambda vv, w, e: model.apply(
        vv, w, None, None, False, emb_a=e, emb_b=e))
    t_tower = timeit(tower, variables, win, emb)
    nchunks = -(-B * F // WC)
    print(f"main tower chunk [{WC} windows]    : {t_tower*1e3:8.2f} ms "
          f"x {nchunks} chunks = {t_tower*nchunks*1e3:8.1f} ms")

    lm = jnp.asarray(rng.standard_normal((B, F, 201)).astype(np.float32) - 4)
    ph = jnp.asarray(rng.standard_normal((B, F, 201)).astype(np.float32))
    ist = jax.jit(lambda a, b: sp.istft(jnp.exp(a) * jnp.cos(b),
                                        jnp.exp(a) * jnp.sin(b)))
    t_ist = timeit(ist, lm, ph)
    print(f"iSTFT [B={B},F={F}]               : {t_ist*1e3:8.2f} ms")

    audio = B * args.seconds
    total = 4 * t_spec + t_enc + t_tower * nchunks + 2 * t_ist
    print(f"--- sum of parts: {total*1e3:.1f} ms for {audio:.0f} s audio "
          f"=> RTF {audio/total:.1f}x")

    from nhans_tpu.infer.enhance import Enhancer
    enh = Enhancer(cfg, variables, window_chunk=WC)
    mixed = [rng.standard_normal(L) * 2000 for _ in range(B)]
    pos = [np.zeros(16000)] * B
    neg = [rng.standard_normal(48000) * 800 for _ in range(B)]
    enh.enhance_batch(mixed, pos, neg)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        enh.enhance_batch(mixed, pos, neg)
    t_full = (time.perf_counter() - t0) / 3
    print(f"--- fused full program (incl. host prep): {t_full*1e3:.1f} ms "
          f"=> RTF {audio/t_full:.1f}x")


if __name__ == "__main__":
    main()
