"""Build a small int16 training corpus from the reference's golden demo
audio (the only real audio reachable in this environment; the SPL split
manifests list LibriSpeech/AudioSet IDs but ship no audio).

Split design — the 7 DEMO denoising examples are FULLY held out (neither
their speech nor their noises appear in training), so SI-SDR on them is a
legitimate unseen-speaker / unseen-noise evaluation:

* speech/train: the 15 source_separation `denoised` wavs (separated
  target-speaker speech, ~109 s) + the 5 selective-suppression `target`
  wavs (~20 s)
* speech/valid+test: the 7 denoising `target` wavs (~22 s)
* noise/train: selective-suppression neg+pos noises (10) + the
  audio_examples noise recordings
* noise/valid+test: the 7 denoising `negNoise` wavs

All demo wavs are float32 normalized; they are rescaled to int16 PCM (the
framework's strict audio contract, reference reader.py:118-125).

Usage: python tools/make_demo_corpus.py --out /tmp/nhans_corpus
"""

import argparse
import os
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
DEMO = os.path.join(REF, "DEMO_N-HANS")
AEX = os.path.join(REF, "N_HANS___Selective_Noise", "audio_examples")


def _collect(base, kind_substr):
    out = []
    for dirpath, _dirs, files in sorted(os.walk(base)):
        for f in sorted(files):
            if f.endswith(".wav") and kind_substr in f.split("_")[-1]:
                out.append(os.path.join(dirpath, f))
    return out


# Longest training piece: just under the 4 s length bucket (whole
# frames), so train batches ride the smallest wire bucket — the
# host->device transfer is the throughput bottleneck on remote-attached
# chips (docs/PROFILE.md).
SEG = 63920


def _write_int16(src, dst_dir, name=None, segment=0):
    os.makedirs(dst_dir, exist_ok=True)
    rate, x = wavfile.read(src)
    assert rate == 16000, src
    if x.ndim > 1:
        x = x.mean(axis=1)
    if x.dtype != np.int16:
        x = np.asarray(x, np.float64)
        peak = np.max(np.abs(x)) + 1e-9
        x = np.rint(x / peak * 32000.0).astype(np.int16)
    name = name or os.path.basename(src)
    if segment and len(x) > segment:
        stem, ext = os.path.splitext(name)
        for j, s0 in enumerate(range(0, len(x), segment)):
            piece = x[s0:s0 + segment]
            if len(piece) < 16000:  # drop sub-second tails
                continue
            wavfile.write(os.path.join(dst_dir, f"{stem}_{j}{ext}"),
                          rate, piece)
        return
    wavfile.write(os.path.join(dst_dir, name), rate, x)


def _speed_perturb(src_dir, factors=(0.9, 1.1)):
    """Kaldi-style speed perturbation of every wav in ``src_dir``:
    resample by 10/9 and 10/11 (tempo+pitch shift), written alongside the
    originals.  Standard small-corpus augmentation; applied at corpus
    build so the training pipeline itself stays reference-faithful."""
    from fractions import Fraction

    from scipy.signal import resample_poly
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".wav"):
            continue
        rate, x = wavfile.read(os.path.join(src_dir, f))
        for fac in factors:
            # speed fac => duration x 1/fac => resample by 1/fac
            frac = Fraction(1.0 / fac).limit_denominator(100)
            up, dn = frac.numerator, frac.denominator
            y = resample_poly(x.astype(np.float64), up, dn)
            y = np.clip(np.rint(y), -32768, 32767).astype(np.int16)
            tag = str(fac).replace(".", "")
            # keep every piece within the SEG wire bucket (slowdown can
            # push a SEG-sized segment past it, which would bump every
            # train batch into the next padded-length bucket)
            for j, s0 in enumerate(range(0, len(y), SEG)):
                piece = y[s0:s0 + SEG]
                if len(piece) < 16000:
                    continue
                wavfile.write(os.path.join(
                    src_dir, f[:-4] + f"_sp{tag}_{j}.wav"), rate, piece)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/nhans_corpus")
    p.add_argument("--speed_perturb", action="store_true", default=False,
                   help="add 0.9x/1.1x resampled copies of train speech "
                        "and noise (3x corpus)")
    args = p.parse_args()

    speech = os.path.join(args.out, "speech")
    noise = os.path.join(args.out, "noise")
    # start clean: stale files from previous builds would leak into splits
    import shutil
    for d in (speech, noise):
        if os.path.isdir(d):
            shutil.rmtree(d)

    # --- speech/train: every clean speech source outside the held-out
    # denoising examples.  The source_separation posNoise/negNoise files
    # are SPEAKER recordings (clean speech — the separator's conditioning
    # contexts), target ~= denoised (same utterance); speaker IDs are
    # VoxCeleb-style, disjoint from the denoising examples' LibriSpeech
    # speakers, so there is no leakage into the eval split.
    ss = os.path.join(DEMO, "source_separation")
    train_speech = (_collect(ss, "denoised")
                    + _collect(ss, "target")
                    + _collect(ss, "posNoise")
                    + _collect(ss, "negNoise")
                    + _collect(os.path.join(DEMO,
                                            "selective_noise_suppression"),
                               "target"))
    ss_aex = os.path.join(REF, "N_HANS___Source_Separation",
                          "audio_examples")
    for f in ("target_speaker.wav", "noise_speaker.wav"):
        p_ = os.path.join(ss_aex, f)
        if os.path.exists(p_):
            train_speech.append(p_)
    for i, p_ in enumerate(train_speech):
        _write_int16(p_, os.path.join(speech, "train"), f"sp{i:03d}.wav",
                     segment=SEG)
    if args.speed_perturb:
        _speed_perturb(os.path.join(speech, "train"))

    # --- speech/valid + test: held-out denoising targets, looped to ~10 s.
    # The reference eval protocol reserves the first 200 frames (2 s) of
    # every utterance as conditioning context and scores only the rest
    # (reference reader.py:398-420); the demo targets are 2-5 s, which
    # leaves some utterances with a handful of scored frames.  Looping to
    # eval-buffer length (10 s, like the LibriSpeech utterances the
    # reference evaluated on) makes the held-out SI-SDR well-defined.
    EVAL_LEN = 160000
    for split in ("valid", "test"):
        dst = os.path.join(speech, split)
        os.makedirs(dst, exist_ok=True)
        for i, p_ in enumerate(_collect(os.path.join(DEMO, "denoising"),
                                        "target")):
            rate, x = wavfile.read(p_)
            assert rate == 16000, p_
            if x.dtype != np.int16:
                x = np.asarray(x, np.float64)
                x = np.rint(x / (np.max(np.abs(x)) + 1e-9)
                            * 32000.0).astype(np.int16)
            reps = int(np.ceil(EVAL_LEN / max(len(x), 1)))
            x = np.tile(x, reps)[:EVAL_LEN]
            wavfile.write(os.path.join(dst, f"dn{i:03d}.wav"), rate, x)

    # --- noise/train
    train_noise = (_collect(os.path.join(DEMO,
                                         "selective_noise_suppression"),
                            "negNoise")
                   + _collect(os.path.join(DEMO,
                                           "selective_noise_suppression"),
                              "posNoise"))
    for f in ("exp1_noise.wav", "exp2_noise.wav", "exp1_+noise.wav",
              "exp1_-noise.wav"):
        p_ = os.path.join(AEX, f)
        if os.path.exists(p_):
            train_noise.append(p_)
    for i, p_ in enumerate(train_noise):
        _write_int16(p_, os.path.join(noise, "train"), f"ns{i:03d}.wav",
                     segment=SEG)
    if args.speed_perturb:
        _speed_perturb(os.path.join(noise, "train"))

    # --- noise/valid + test: held-out denoising negNoises
    for split in ("valid", "test"):
        for i, p_ in enumerate(_collect(os.path.join(DEMO, "denoising"),
                                        "negNoise")):
            _write_int16(p_, os.path.join(noise, split), f"dn_ns{i:03d}.wav")

    from nhans_tpu.data.manifest import create_seeds
    sp = create_seeds(speech)
    ns = create_seeds(noise)
    for k in ("train", "valid", "test"):
        print(f"{k}: {len(sp[k])} speech, {len(ns[k])} noise")
    print(f"corpus at {args.out}")


if __name__ == "__main__":
    main()
