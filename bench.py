"""Benchmark harness: batched 16 kHz denoising real-time factor per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >=50x real-time per TPU v5e chip (BASELINE.md), so
vs_baseline = rtf / 50.

The measured path is the full production inference program: wav buffers ->
STFT -> all sliding windows -> conditional ResNet (contexts encoded once)
-> residual add -> masked iSTFT, as one XLA program (nhans_tpu.infer).
"""

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16, help="utterances per call")
    p.add_argument("--seconds", type=float, default=10.0,
                   help="utterance length (s)")
    p.add_argument("--iters", type=int, default=5)
    # float32 measured FASTER than bfloat16 here (105 vs 100x RTF): the
    # tower's small odd conv shapes (35x201 windows) gain nothing from
    # bf16 MXU tiling, so keep full precision.  window_chunk=2048 is the
    # largest that fits HBM (4096 OOMs at 17.3G/15.75G).
    p.add_argument("--window_chunk", type=int, default=2048)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    args = p.parse_args()

    import dataclasses
    import jax
    from nhans_tpu.config import Config
    from nhans_tpu.infer.enhance import Enhancer
    from nhans_tpu.models import init_variables

    cfg = Config.denoiser()
    if args.dtype != "float32":
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype=args.dtype))
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, variables, window_chunk=args.window_chunk)

    fs = cfg.audio.sample_rate
    n = int(args.seconds * fs)
    rng = np.random.default_rng(0)
    mixed = [rng.standard_normal(n) * 2000 for _ in range(args.batch)]
    pos = [np.zeros(fs)] * args.batch           # silence positive context
    neg = [rng.standard_normal(fs * 3) * 800 for _ in range(args.batch)]

    # warmup (compile)
    out = enh.enhance_batch(mixed, pos, neg)
    assert np.isfinite(out["denoised"][0]).all()

    # steady-state serving throughput: pipelined stream keeps transfers
    # overlapped with device compute (production pattern)
    t0 = time.perf_counter()
    for out in enh.enhance_stream(
            ((mixed, pos, neg) for _ in range(args.iters))):
        pass
    elapsed = time.perf_counter() - t0

    audio_seconds = args.batch * args.seconds * args.iters
    rtf = audio_seconds / elapsed
    print(json.dumps({
        "metric": "denoise_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
