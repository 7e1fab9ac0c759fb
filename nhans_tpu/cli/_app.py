"""Shared CLI machinery for nhans_denoiser / nhans_separator.

Improvements over the reference (documented divergences, SURVEY.md §7):
* named model outputs + an explicit ``--checkpoint`` flag instead of the
  auto-generated ``add_72:0`` tensor and the hard-coded ``./trained_model``
  path (reference apply.py:430-437),
* folder-batch mode and automatic format conversion, which the reference
  README promises (README.md:42,59-66) but only ships in the PyPI-only
  load_model.py,
* derived output names use splitext instead of assuming the output
  filename ends in ``denoised.wav`` (reference apply.py:457-470).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from nhans_tpu.config import Config, add_reference_flags
from nhans_tpu.utils import wavio


def _sidecar(path: str, tag: str) -> str:
    base, ext = os.path.splitext(path)
    return f"{base}_{tag}{ext or '.wav'}"


def load_enhancer(cfg: Config, checkpoint: str, window_chunk: int = 2048,
                  buckets_seconds=None, mesh: str = "off"):
    import dataclasses

    import jax
    from nhans_tpu.infer.enhance import DEFAULT_BUCKETS_SECONDS, Enhancer
    from nhans_tpu.models import init_variables
    from nhans_tpu.train.checkpoint import load_variables

    # MXU lane padding (ModelConfig.freq_pad_to) is available for
    # serving via NHANS_FREQ_PAD=256 — bit-compatible with unpadded
    # checkpoints (tests/test_model_oracle.py) — but is NOT the serving
    # default: the padding win is regime-dependent (measured round 5:
    # +2.25x at the 64-window training batch, −18% RTF at the
    # 2048-window serving chunks where the native geometry already
    # tiles the MXU; docs/PROFILE.md).
    if cfg.model.freq_pad_to == 0:
        pad = int(os.environ.get("NHANS_FREQ_PAD", "0") or 0)
        if pad > cfg.model.num_features:
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, freq_pad_to=pad))

    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    if checkpoint:
        template = jax.tree_util.tree_map(np.asarray, variables)
        variables = load_variables(checkpoint, template)
    else:
        print("WARNING: no --checkpoint given; using randomly initialized "
              "weights (identity enhancement). Train a model or import the "
              "published TF checkpoint with nhans_tpu.compat.",
              file=sys.stderr)
    device_mesh = None
    if mesh == "auto" and len(jax.devices()) > 1:
        from nhans_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        n = 1 << (n.bit_length() - 1)  # largest power of two
        device_mesh = make_mesh(data=n)
        print(f"serving sharded over {n} devices", file=sys.stderr)
    return Enhancer(cfg, variables, window_chunk=window_chunk,
                    buckets_seconds=buckets_seconds or DEFAULT_BUCKETS_SECONDS,
                    mesh=device_mesh)


def _read(path: str, fs: int) -> np.ndarray:
    return wavio.read_for_processing(path, fs)


def _silent(fs: int) -> np.ndarray:
    """Implicit positive context for plain denoising: silence
    (reference apply.py:478-481 uses the bundled Silent.wav)."""
    return np.zeros(fs, np.float64)


def demo_mix(cfg: Config, task: str, clean: np.ndarray, pos: np.ndarray,
             neg: np.ndarray) -> np.ndarray:
    """--demo: mix the clean input with the contexts at 0 dB first
    (reference apply_demo, apply.py:129-135 uses SNRs[1] == 0).

    Returns an INT16-SCALE float signal: the mixers peak-normalize to
    |x| <= 1.0, but the Enhancer expects int16-scale input
    (prepare_wave rounds to int16 for the wire), so the result is scaled
    back up — without this the demo signal quantizes to {-1, 0, 1}."""
    import jax.numpy as jnp
    from nhans_tpu.dsp import mixing as mx
    c = clean / (np.max(np.abs(clean)) + 1e-6)
    n = cfg.audio.trim_to_whole_frames(len(c))
    c = c[:n]
    if task == "denoiser":
        p = pos / (np.max(np.abs(pos)) + 1e-6)
        ng = neg / (np.max(np.abs(neg)) + 1e-6)
        mixed, _, _, _ = mx.mix_two_noise(
            jnp.asarray(c, jnp.float32),
            jnp.asarray(np.resize(p, n).astype(np.float32)),
            jnp.asarray(np.resize(ng, n).astype(np.float32)),
            n, n, n, 0.0, 0.0)
    else:
        ng = neg / (np.max(np.abs(neg)) + 1e-6)
        _, _, mixed, _ = mx.mix_one_noise(
            jnp.asarray(c, jnp.float32),
            jnp.asarray(np.resize(ng, n).astype(np.float32)),
            n, n, 0.0)
    return np.asarray(mixed, np.float64) * 32767.0


def run(task: str) -> None:
    parser = argparse.ArgumentParser(
        prog=f"nhans_{task}",
        description=f"N-HANS/TPU {task} (TPU-native rebuild)")
    add_reference_flags(parser, inference=True, task=task)
    args = parser.parse_args()
    cfg = (Config.denoiser() if task == "denoiser" else Config.separator())
    fs = args.Fs

    enhancer = load_enhancer(cfg, args.checkpoint,
                             mesh=getattr(args, "mesh", "off"))

    if os.path.isdir(args.input):
        inputs = wavio.list_wavs(args.input)
        if not inputs:
            print(f"no wavs under {args.input}", file=sys.stderr)
            sys.exit(1)
        os.makedirs(args.output, exist_ok=True)
        outputs = [os.path.join(args.output, os.path.basename(p))
                   for p in inputs]
    else:
        inputs, outputs = [args.input], [args.output]

    pos = (_read(args.pos, fs) if args.pos and os.path.exists(args.pos)
           else _silent(fs))
    neg = _read(args.neg, fs)

    # Context slot order differs per task (see NHANSNet docstring):
    # denoiser: ctx_a = pos noise, ctx_b = neg noise (reference
    # Selective_Noise/apply.py:444-446); separator: ctx_a = interference
    # (--neg), ctx_b = target speaker (--pos)
    # (Source_Separation/apply.py:99-101).
    if task == "denoiser":
        ctx_a, ctx_b = pos, neg
    else:
        ctx_a, ctx_b = neg, pos

    def maybe_mix(clean: np.ndarray) -> np.ndarray:
        if not args.demo:
            return clean
        return demo_mix(cfg, task, clean, pos, neg)

    # very long inputs go through the exact segmented path (fixed set of
    # compiled programs regardless of duration)
    long_threshold = enhancer.buckets[-1]

    def run_batch(waves):
        if len(waves) == 1 and len(waves[0]) > long_threshold:
            r = enhancer.enhance_long(waves[0], ctx_a, ctx_b)
            return {k: ([v] if not isinstance(v, float) else np.array([v]))
                    for k, v in r.items()}
        return enhancer.enhance_batch(
            waves, [ctx_a] * len(waves), [ctx_b] * len(waves))

    # folder mode batches utterances through one XLA program
    batch = 8 if len(inputs) > 1 else 1
    for i in range(0, len(inputs), batch):
        chunk_in = inputs[i:i + batch]
        waves = [maybe_mix(_read(p, fs)) for p in chunk_in]
        res = run_batch(waves)
        for j, out_path in enumerate(outputs[i:i + batch]):
            den = res["denoised"][j]
            mix = res["mixed_processed"][j]
            rem = res["removed"][j]
            snr_est = float(res["snr_est"][j])
            wavio.write_wav(out_path, den, fs)
            wavio.write_wav(_sidecar(out_path, "mixed_processed"), mix, fs)
            wavio.write_wav(_sidecar(out_path, "removed"), rem, fs)
            if task == "denoiser":
                print(snr_est)
                comp = enhancer.compensate(den, rem, snr_est,
                                           args.compensate, args.ac)
                wavio.write_wav(_sidecar(out_path, "compensated"), comp, fs)
            print(f"{chunk_in[j]} -> {out_path}")
