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
import os
import time

import numpy as np


def bench_train(args) -> None:
    """Training-throughput benchmark: the full jitted step (on-device
    mixing/STFT/crops + fwd + bwd + optimizer + BN update) on the chip.
    Reports steps/sec, windows/sec (reference minibatch = 64 windows,
    reference main.py:71) and an MFU estimate from XLA's cost analysis.
    Matches the reference's monitor timing (reference main.py:582-585)."""
    import time

    import jax
    import jax.numpy as jnp
    from nhans_tpu.config import Config
    from nhans_tpu.train.step import create_state, make_train_step

    cfg = Config.denoiser()
    import dataclasses
    if args.dtype != "float32" or args.freq_pad_to:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype=args.dtype,
            freq_pad_to=args.freq_pad_to))
    # 64 windows per step = 16 utterances x 4 crops (reference mb=64)
    B = args.train_utts
    L = cfg.data.max_samples
    model, state, tx = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    if args.banked:
        # production hot loop since round 2: device-resident corpus
        # banks + per-step int32 index triples (data/banks.py)
        L = 63920  # 4 s segment bucket (the quality-run corpus shape)
        N = 128
        step = make_train_step(cfg, model, tx, donate=False, banked=True)
        banks = {
            "speech": jnp.asarray(
                (rng.standard_normal((N, L)) * 3000).astype(np.int16)),
            "speech_len": jnp.full((N,), L, jnp.int32),
            "speech_peak": jnp.full((N,), 9000.0, jnp.float32),
        }
        banks["noise"] = banks["speech"]
        banks["noise_len"] = banks["speech_len"]
        banks["noise_peak"] = banks["speech_peak"]
        idx = {k: jnp.asarray(rng.integers(N, size=B).astype(np.int32))
               for k in ("clean_idx", "a_idx", "b_idx")}
        run = lambda s, k: step(s, banks, idx, k)  # noqa: E731
        lower_args = (state, banks, idx, jax.random.PRNGKey(1))
        lowered = jax.jit(step).lower(*lower_args)
    else:
        step = make_train_step(cfg, model, tx, donate=False)
        batch = {
            "clean": (rng.standard_normal((B, L)) * 3000).astype(np.int16),
            "noise_a": (rng.standard_normal((B, L)) * 3000).astype(np.int16),
            "noise_b": (rng.standard_normal((B, L)) * 3000).astype(np.int16),
            "clean_len": np.full((B,), L, np.int32),
            "len_a": np.full((B,), L, np.int32),
            "len_b": np.full((B,), L, np.int32),
            "peaks": np.full((B, 3), 9000.0, np.float32),
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        run = lambda s, k: step(s, batch, k)  # noqa: E731
        lowered = jax.jit(lambda s, b, k: step(s, b, k)).lower(
            state, batch, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(1)

    compiled = lowered.compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = 0.0

    state, metrics = run(state, key)
    _ = float(np.asarray(metrics["loss"]))  # sync (host readback)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = run(state, key)
    _ = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / args.iters

    windows = B * cfg.data.slices_per_step
    peak = 197e12 if args.dtype == "bfloat16" else 98.5e12  # v5e
    print(json.dumps({
        "metric": "train_windows_per_sec_per_chip",
        "value": round(windows / dt, 1),
        "unit": "windows/s",
        "vs_baseline": round((windows / dt) / 64.0, 3),  # ref mb / s = 1
        "steps_per_sec": round(1.0 / dt, 3),
        "step_ms": round(dt * 1e3, 2),
        "flops_per_step": flops,
        "mfu_est": round(flops / dt / peak, 4) if flops else None,
        "dtype": args.dtype,
        "windows_per_step": windows,
        "pipeline": "banked" if args.banked else "streamed",
    }))


def bench_suite(args) -> None:
    """BASELINE.md benchmark configs, end to end on real reference audio:
    single-wav denoise (exp2), selective suppression with pos+neg (exp1),
    separation on mixed.wav, folder-batch mode over the DEMO corpus.
    Prints one JSON line whose ``configs`` dict carries per-config RTF."""
    import jax
    from nhans_tpu.config import Config
    from nhans_tpu.infer.enhance import Enhancer
    from nhans_tpu.models import init_variables
    from nhans_tpu.utils import wavio

    ref = args.reference_root
    aex = os.path.join(ref, "N_HANS___Selective_Noise", "audio_examples")
    ss_aex = os.path.join(ref, "N_HANS___Source_Separation",
                          "audio_examples")
    demo = os.path.join(ref, "DEMO_N-HANS", "denoising")
    if not os.path.isdir(aex):
        raise SystemExit(f"--mode suite needs the reference audio at "
                         f"{ref} (set --reference_root)")

    def rd(path):
        return wavio.read_for_processing(path)

    def timed(enh, mixed, a, b, iters=args.iters):
        out = enh.enhance_batch(mixed, a, b)     # compile + warm
        assert np.isfinite(out["denoised"][0]).all()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = enh.enhance_batch(mixed, a, b)
        dt = (time.perf_counter() - t0) / iters
        secs = sum(len(m) for m in mixed) / 16000.0
        return round(secs / dt, 2)

    configs = {}
    import dataclasses as _dc
    fpad = max(args.freq_pad_to, 0)
    cfg = Config.denoiser()
    if fpad:  # serving parity (see infer mode)
        cfg = cfg.replace(model=_dc.replace(cfg.model, freq_pad_to=fpad))
    _, var_d = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, var_d, window_chunk=args.window_chunk)

    silent = rd(os.path.join(aex, "Silent.wav"))
    # 1. single-wav denoise (exp2): the reference README's primary CLI use
    configs["denoise_exp2_single"] = timed(
        enh, [rd(os.path.join(aex, "exp2_noisy.wav"))], [silent],
        [rd(os.path.join(aex, "exp2_noise.wav"))])
    # 2. selective suppression (exp1): keep +noise, remove -noise
    configs["selective_exp1"] = timed(
        enh, [rd(os.path.join(aex, "exp1_noisy.wav"))],
        [rd(os.path.join(aex, "exp1_+noise.wav"))],
        [rd(os.path.join(aex, "exp1_-noise.wav"))])
    # 3. folder-batch mode: all DEMO denoising mixed wavs in one batch
    mixed, poss, negs = [], [], []
    for ex in sorted(os.listdir(demo)):
        d = os.path.join(demo, ex)
        if not os.path.isdir(d):
            continue
        files = {f.split("_")[-1]: os.path.join(d, f)
                 for f in os.listdir(d)}
        mixed.append(rd(files["mixed.wav"]))
        poss.append(silent)
        negs.append(rd(files["negNoise.wav"]))
    configs["folder_batch_demo7"] = timed(enh, mixed, poss, negs)
    # 4. separation on mixed.wav with speaker contexts
    scfg = Config.separator()
    if fpad:
        scfg = scfg.replace(model=_dc.replace(scfg.model,
                                              freq_pad_to=fpad))
    _, var_s = init_variables(scfg, jax.random.PRNGKey(0), train=False)
    senh = Enhancer(scfg, var_s, window_chunk=args.window_chunk)
    configs["separation_mixed"] = timed(
        senh, [rd(os.path.join(ss_aex, "mixed.wav"))],
        [rd(os.path.join(ss_aex, "target_speaker.wav"))],
        [rd(os.path.join(ss_aex, "noise_speaker.wav"))])

    # 5. segmented long-audio (enhance_long): 5 minutes of real audio
    # through the FIXED 32 s-segment programs with halo excision — the
    # long-utterance scaling path (SURVEY.md §5), which bounds compiled
    # program count regardless of duration
    lm = rd(os.path.join(aex, "exp2_noisy.wav"))
    ln = rd(os.path.join(aex, "exp2_noise.wav"))
    n5 = 300 * 16000
    long_mixed = np.tile(lm, -(-n5 // len(lm)))[:n5]
    out = enh.enhance_long(long_mixed, silent, ln)      # compile + warm
    assert np.isfinite(out["denoised"]).all()
    t0 = time.perf_counter()
    out = enh.enhance_long(long_mixed, silent, ln)
    configs["long_audio_5min_segmented"] = round(
        (n5 / 16000.0) / (time.perf_counter() - t0), 2)

    # These configs measure single-call/interactive latency on SHORT real
    # wavs (3-30 s of audio per call) — they are dispatch/transfer-bound,
    # not the batched-throughput regime of BASELINE.md's >=50x target
    # (which `--mode infer`, the default, measures at 100x+).  Baseline
    # for interactive use is 1x real-time.
    print(json.dumps({
        "metric": "suite_min_rtf_single_call",
        "value": min(configs.values()),
        "unit": "x_realtime",
        "baseline": 1.0,
        "baseline_name": "interactive real-time (1x)",
        "regime": "single_call",
        "vs_baseline": round(min(configs.values()) / 1.0, 3),
        "configs": configs,
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="infer",
                   choices=("infer", "train", "suite"))
    p.add_argument("--batch", type=int, default=16, help="utterances per call")
    p.add_argument("--train_utts", type=int, default=16,
                   help="utterances per train step (x slices_per_step=4 "
                        "crops = 64 windows, the reference minibatch)")
    p.add_argument("--seconds", type=float, default=10.0,
                   help="utterance length (s)")
    p.add_argument("--iters", type=int, default=5)
    # float32 measured FASTER than bfloat16 here (105 vs 100x RTF): the
    # tower's small odd conv shapes (35x201 windows) gain nothing from
    # bf16 MXU tiling, so keep full precision.  window_chunk=2048 is the
    # largest that fits HBM (4096 OOMs at 17.3G/15.75G).
    p.add_argument("--window_chunk", type=int, default=2048)
    p.add_argument("--freq_pad_to", type=int, default=0,
                   help="MXU lane padding for the tower frequency axis "
                        "(ModelConfig.freq_pad_to); 0 = native "
                        "geometry (serving default — the padding win "
                        "is regime-dependent, docs/PROFILE.md)")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--reference_root", default="/root/reference",
                   help="root of the reference checkout (real audio for "
                        "--mode suite and the real-audio default batch)")
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="use Gaussian-noise inputs for --mode infer "
                        "instead of real reference audio")
    p.add_argument("--banked", action="store_true", default=False,
                   help="--mode train: measure the device-bank (indexed)"
                        " production step instead of the streamed-batch "
                        "step")
    args = p.parse_args()

    if args.mode == "train":
        bench_train(args)
        return
    if args.mode == "suite":
        bench_suite(args)
        return

    import dataclasses
    import jax
    from nhans_tpu.config import Config
    from nhans_tpu.infer.enhance import Enhancer
    from nhans_tpu.models import init_variables

    cfg = Config.denoiser()
    # serving parity: native geometry (the measured-faster regime at
    # 2048-window serving chunks — docs/PROFILE.md round 5);
    # --freq_pad_to 256 A/Bs the lane-padded tower.
    fpad = max(args.freq_pad_to, 0)
    if args.dtype != "float32" or fpad:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype=args.dtype, freq_pad_to=fpad))
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    enh = Enhancer(cfg, variables, window_chunk=args.window_chunk)

    fs = cfg.audio.sample_rate
    n = int(args.seconds * fs)
    rng = np.random.default_rng(0)
    demo = os.path.join(args.reference_root, "DEMO_N-HANS", "denoising")
    if not args.synthetic and os.path.isdir(demo):
        # real-audio batch: the 7 DEMO denoising mixed wavs looped/trimmed
        # to the bench length, tiled round-robin to fill the batch; each
        # keeps its own real negNoise suppression context
        from nhans_tpu.utils import wavio as _wavio
        src = []
        for ex in sorted(os.listdir(demo)):
            d = os.path.join(demo, ex)
            if not os.path.isdir(d):
                continue
            files = {f.split("_")[-1]: os.path.join(d, f)
                     for f in os.listdir(d)}
            m = _wavio.read_for_processing(files["mixed.wav"])
            g = _wavio.read_for_processing(files["negNoise.wav"])
            reps = -(-n // max(len(m), 1))
            src.append((np.tile(m, reps)[:n], g))
        mixed = [src[i % len(src)][0] for i in range(args.batch)]
        neg = [src[i % len(src)][1] for i in range(args.batch)]
        pos = [np.zeros(fs)] * args.batch       # Silent positive context
        audio_source = "demo7_real"
    else:
        mixed = [rng.standard_normal(n) * 2000 for _ in range(args.batch)]
        pos = [np.zeros(fs)] * args.batch       # silence positive context
        neg = [rng.standard_normal(fs * 3) * 800 for _ in range(args.batch)]
        audio_source = "synthetic"

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
        "audio_source": audio_source,
    }))


if __name__ == "__main__":
    main()
