"""Root-cause the bf16 training-throughput anomaly (VERDICT round-4
item 5): bf16 measured only 1.13x over f32 (703 vs 619 windows/s) at
mfu_est 0.40 on a bf16-native v5e, where ~2x is expected.

Times the MAIN tower (8 conditional residual blocks + VALID head — 90%
of step FLOPs, docs/PROFILE.md) through the precomputed-embedding path
on [B, 35, F, 1] window batches:

  * F=201 (shipped geometry) in f32 and bf16,
  * F=256 (frequency dim lane-padded to a multiple of the 128-lane MXU
    tile) in f32 and bf16 — tests the hypothesis that the odd 201 lane
    count forces partial-tile conv work that eats the bf16 advantage.

Prints one JSON line per config.  Run on the real chip:

  python tools/profile_bf16.py [--batch 64] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters):
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def tower_bench(dtype, nbins, batch, iters, rng):
    from nhans_tpu.config import Config
    from nhans_tpu.models import init_variables

    import dataclasses

    cfg = Config.denoiser()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype=dtype, num_features=nbins))
    model, variables = init_variables(cfg, jax.random.PRNGKey(0),
                                      train=True)
    win = cfg.model.window_frames
    x = jnp.asarray(rng.standard_normal((batch, win, nbins)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((batch, 512)), jnp.float32)

    def fwd(v, xx, ea, eb):
        out, _ = model.apply(v, xx, None, None, True, emb_a=ea, emb_b=eb,
                             mutable=["batch_stats"])
        return out

    def loss(v, xx, ea, eb):
        return jnp.mean(jnp.square(fwd(v, xx, ea, eb)))

    jfwd = jax.jit(fwd)
    jbwd = jax.jit(jax.grad(loss))
    tf_ = _time(jfwd, (variables, x, emb, emb), iters)
    tb_ = _time(jbwd, (variables, x, emb, emb), iters)
    return tf_, tb_


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    for name, dtype, nbins in (("f32", "float32", 201),
                               ("bf16", "bfloat16", 201),
                               ("bf16_pad256", "bfloat16", 256),
                               ("f32_pad256", "float32", 256)):
        try:
            tf_, tb_ = tower_bench(dtype, nbins, args.batch, args.iters,
                                   rng)
            print(json.dumps({
                "config": name, "batch": args.batch, "bins": nbins,
                "fwd_ms": round(tf_ * 1e3, 3),
                "fwd_bwd_ms": round(tb_ * 1e3, 3),
                "windows_per_s_bwd": round(args.batch / tb_, 1)}),
                flush=True)
        except Exception as e:  # surface per-config failures, keep going
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
