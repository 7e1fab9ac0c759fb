"""Build a small int16 training corpus from the reference's golden demo
audio (the only real audio reachable in this environment; the SPL split
manifests list LibriSpeech/AudioSet IDs but ship no audio).

Split design (round 2: leak-free three-way split + speaker tags):

* speech/train — separation-example speaker recordings ONLY, written as
  ``spk<ID>_*.wav``: example i's target-side voice (target/denoised/
  posNoise wavs) is speaker ``s<i>t``, its interference voice (negNoise)
  is ``s<i>i``; plus the two Source_Separation audio_examples speakers.
  The separator's speaker-aware sampler (data/banks.py) uses the tags to
  never mix a speaker with itself.
* speech/valid — the 5 selective-suppression ``target`` wavs (looped to
  10 s): the MODEL-SELECTION set, disjoint from both train and test.
* speech/test — the 7 denoising ``target`` wavs (looped to 10 s): the
  REPORTING set (golden-table examples).  Selecting on valid and
  reporting on test removes the round-1 selection leakage
  (docs/QUALITY.md).
* noise/train — selective-suppression posNoise + the audio_examples
  noise recordings.
* noise/valid — the 5 selective-suppression negNoise wavs (held out of
  train so selection is leak-free).
* noise/test — the 7 denoising negNoise wavs.

All demo wavs are float32 normalized; they are rescaled to int16 PCM (the
framework's strict audio contract, reference reader.py:118-125).

Round-4 additions (see the flag help): ``--sns_valid`` moves SELECTION to
the unused snsExample sets so the 5 selective examples become a second
LEAK-FREE report set; ``--residual_voices`` recovers the 15 separation
examples' interference voices as mixed-denoised residuals (doubling the
train voice count); ``--synth_count`` pools procedural noise families.

Usage (round-4 recipe):
  python tools/make_demo_corpus.py --out /tmp/nhans_corpus4 \
      --speed_perturb --speech_perturb_factors 0.9,0.95,1.05,1.1 \
      --pseudo_speakers --sns_train --sns_valid --residual_voices \
      --synth_count 12 --silent_noises 6 --separator_holdout 3
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

# Longest training piece: just under the 4 s length bucket (whole
# frames), so train batches ride the smallest wire bucket — the
# host->device transfer is the throughput bottleneck on remote-attached
# chips (docs/PROFILE.md).
SEG = 63920
EVAL_LEN = 160000  # eval utterances looped to 10 s: the eval protocol
# reserves the first 2 s as context (reference reader.py:398-420)


SNS_PAT = None  # compiled lazily (module import keeps re usage local)


def _sns_examples():
    """Parse ``Selective_Noise_Suppression_samples``: {exn: info} with
    speaker id, the two AudioSet noise ids, and per-kind paths.  The SPL
    dir ships a byte-identical copy of this set (md5-verified), so only
    this one is read."""
    import re
    global SNS_PAT
    if SNS_PAT is None:
        SNS_PAT = re.compile(
            r"snsExample(\d+)_(\d+)-\d+-\d+_(.{11})_[\d.]+_(.{11})_[\d.]+"
            r"_-?\d+_-?\d+_(target|denoised|posNoise|negNoise|mixed)\.wav$")
    sns = os.path.join(DEMO, "Selective_Noise_Suppression_samples")
    out = {}
    for f in sorted(os.listdir(sns)):
        m = SNS_PAT.match(f)
        if not m:
            continue
        exn, spk, pos_id, neg_id, kind = m.groups()
        info = out.setdefault(int(exn), {"spk": spk, "pos_id": pos_id,
                                         "neg_id": neg_id})
        info[kind] = os.path.join(sns, f)
    return out


def _demo_speakers_and_noise_ids(*dirs):
    """LibriSpeech speaker ids + 11-char AudioSet noise ids referenced by
    filenames under the given demo dirs (the leak-check universe)."""
    import re
    spk, nid = set(), set()
    for d in dirs:
        for _dp, _dd, files in os.walk(d):
            for f in files:
                m = re.search(r"_(\d+)-\d+-\d+_", f)
                if m:
                    spk.add(m.group(1))
                # AudioSet ids are fixed 11 chars and may contain "_";
                # lookbehind so back-to-back "_id_off_id_off_" pairs both
                # match (a consuming match would eat the shared "_")
                for m in re.finditer(r"(?<=_)(.{11})_\d+\.\d{3}_", f):
                    nid.add(m.group(1))
    return spk, nid


def _residual_int16(exdir):
    """The interference speaker's audio, extracted as mixed − denoised —
    the reference's own 'removed.wav' convention (apply.py:453-461).
    The separation example dirs ship ONLY mixed+denoised, so this
    residual is the only access to each example's second voice; measured
    speech-band (<3% energy below 150 Hz) with |corr(res, denoised)| ≤
    0.23 across examples.  Returns int16 (peak-normalized) or None."""
    den = _collect(exdir, "denoised")
    mix = _collect(exdir, "mixed")
    if not den or not mix:
        return None
    r1, d = wavfile.read(den[0])
    r2, m = wavfile.read(mix[0])
    if r1 != 16000 or r2 != 16000:
        return None
    n = min(len(d), len(m))
    res = np.asarray(m[:n], np.float64) - np.asarray(d[:n], np.float64)
    peak = np.max(np.abs(res)) + 1e-9
    return np.rint(res / peak * 32000.0).astype(np.int16)


def _write_int16_array(x, dst_dir, name, segment=0):
    os.makedirs(dst_dir, exist_ok=True)
    if segment and len(x) > segment:
        stem, ext = os.path.splitext(name)
        for j, s0 in enumerate(range(0, len(x), segment)):
            piece = x[s0:s0 + segment]
            if len(piece) < 16000:
                continue
            wavfile.write(os.path.join(dst_dir, f"{stem}_{j}{ext}"),
                          16000, piece)
        return
    if len(x) < 16000:  # same sub-second filter as the segmented path
        return
    wavfile.write(os.path.join(dst_dir, name), 16000, x)


def _collect(base, kind_substr):
    out = []
    for dirpath, _dirs, files in sorted(os.walk(base)):
        for f in sorted(files):
            if f.endswith(".wav") and kind_substr in f.split("_")[-1]:
                out.append(os.path.join(dirpath, f))
    return out


def _to_int16(path):
    rate, x = wavfile.read(path)
    assert rate == 16000, path
    if x.ndim > 1:
        x = x.mean(axis=1)
    if x.dtype != np.int16:
        x = np.asarray(x, np.float64)
        peak = np.max(np.abs(x)) + 1e-9
        x = np.rint(x / peak * 32000.0).astype(np.int16)
    return x


def _write_int16(src, dst_dir, name=None, segment=0):
    os.makedirs(dst_dir, exist_ok=True)
    x = _to_int16(src)
    name = name or os.path.basename(src)
    if segment and len(x) > segment:
        stem, ext = os.path.splitext(name)
        for j, s0 in enumerate(range(0, len(x), segment)):
            piece = x[s0:s0 + segment]
            if len(piece) < 16000:  # drop sub-second tails
                continue
            wavfile.write(os.path.join(dst_dir, f"{stem}_{j}{ext}"),
                          16000, piece)
        return
    wavfile.write(os.path.join(dst_dir, name), 16000, x)


def _write_looped(src, dst_dir, name):
    os.makedirs(dst_dir, exist_ok=True)
    x = _to_int16(src)
    reps = int(np.ceil(EVAL_LEN / max(len(x), 1)))
    wavfile.write(os.path.join(dst_dir, name), 16000,
                  np.tile(x, reps)[:EVAL_LEN])


def build_seen_eval(out_root, min_segments=2):
    """Write ``speech/valid_seen`` + its manifest: a SEEN-SPEAKER
    separator eval split.

    With 17 training speakers the separator cannot learn
    speaker-generalization (the published model saw thousands of
    speakers), so the unseen-speaker valid split measures a wall that is
    corpus-scale, not framework.  This split measures what IS learnable
    here: separating *training* speakers in mixtures that never occurred
    during training (EvalLoader pairs file i's speaker with file i+1's;
    training pairs, offsets and SNRs are sampled independently).  Each
    eval wav concatenates >=``min_segments`` unperturbed 4 s training
    segments of one speaker; the eval protocol takes the 2 s context
    from the head (segment 0) and scores the remainder.  This is a
    training-distribution diagnostic, NOT held-out evidence — it is
    reported as such (docs/QUALITY.md).

    Additive: only creates ``valid_seen/`` + ``valid_seen.json``; safe to
    run next to a live training process using the same corpus root.
    """
    import json
    import re

    import shutil

    train_dir = os.path.join(out_root, "speech", "train")
    dst = os.path.join(out_root, "speech", "valid_seen")
    if os.path.isdir(dst):  # own output dir only; rest of corpus untouched
        shutil.rmtree(dst)
    by_spk = {}
    for f in sorted(os.listdir(train_dir)):
        m = re.match(r"(spk[a-z0-9]+)_", f)
        if not m or "_sp" in f[len(m.group(1)):] \
                or "_vt" in f[len(m.group(1)):]:
            continue  # perturbed copies duplicate material
        if not m.group(1).endswith("t") and not m.group(1).endswith("i"):
            continue
        by_spk.setdefault(m.group(1), []).append(
            os.path.join(train_dir, f))
    os.makedirs(dst, exist_ok=True)
    paths, n = [], 0
    for spk, files in sorted(by_spk.items()):
        if len(files) < min_segments:
            continue
        x = np.concatenate([_to_int16(p) for p in files[:4]])[:EVAL_LEN]
        if len(x) < EVAL_LEN:  # eval protocol needs >= 10 s
            x = np.tile(x, int(np.ceil(EVAL_LEN / len(x))))[:EVAL_LEN]
        name = f"seen{n:02d}_{spk}.wav"
        wavfile.write(os.path.join(dst, name), 16000, x)
        paths.append(os.path.join(dst, name))
        n += 1
    with open(os.path.join(out_root, "speech", "valid_seen.json"),
              "w") as f:
        json.dump(paths, f, indent=1)
    print(f"valid_seen: {n} seen-speaker eval wavs -> {dst}")
    return paths


def build_arbiter(out_root, count=12, seed=777):
    """Write ``speech/arbiter`` + ``noise/arbiter`` (+manifests): the
    round-5 NEUTRAL ARBITER split for DENOISER ship decisions.

    Motivation (VERDICT round 4): the r3-vs-q4 flagship decision had no
    split that neither finalist's training or selection touched — v4
    valid is biased toward r3 (its speech trained r3 via --sns_train)
    and the golden 7 are the REPORT set.  This split is neutral by
    construction for every past and future DENOISER candidate:

    * speech = the ``valid_sep`` utterances verbatim: the
      deterministic last-3 held-out separation voices (plus their
      residual interferers), excluded from train in every corpus since
      v3 and never used by any denoiser selection;
    * noise = ``count`` clips from the EXTENDED synth families
      (tools/synth_noises.py sawtooth_buzz/gated_bursts/tonal_cluster,
      fresh seed): the BASE families seeded v4 training noise, so
      base-family arbiter noise would hand v4-trained candidates an
      in-distribution advantage; the extended families appear in no
      training pool.

    Scope: denoiser decisions ONLY — separator candidates SELECT on
    valid_sep, so this speech is not neutral for them.  Mixing SNRs are
    md5-deterministic per utterance (EvalLoader convention, reference
    reader.py:213-216); with 2*count >= utterances each eval utterance
    draws a distinct (pos, neg) noise pair under the default
    ``noise[(2i) % N]`` pairing.  Additive: only touches arbiter/
    dirs + manifests; safe next to a live run on the same corpus."""
    import json
    import shutil
    import subprocess
    import sys as _sys

    vs_manifest = os.path.join(out_root, "speech", "valid_sep.json")
    assert os.path.exists(vs_manifest), \
        "arbiter needs valid_sep (build with --separator_holdout first)"
    with open(vs_manifest) as f:
        vs_paths = json.load(f)
    sp_dir = os.path.join(out_root, "speech", "arbiter")
    ns_dir = os.path.join(out_root, "noise", "arbiter")
    for d in (sp_dir, ns_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    os.makedirs(sp_dir)
    paths = []
    for p_ in vs_paths:
        dst = os.path.join(sp_dir, os.path.basename(p_))
        shutil.copyfile(p_, dst)
        paths.append(dst)
    with open(os.path.join(out_root, "speech", "arbiter.json"), "w") as f:
        json.dump(paths, f, indent=1)
    subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "synth_noises.py"),
         "--out", ns_dir, "--count", str(count), "--seconds", "8",
         "--seed", str(seed), "--families", "extended",
         "--prefix", "narb"],
        check=True)
    ns_paths = sorted(os.path.join(ns_dir, f) for f in os.listdir(ns_dir)
                      if f.endswith(".wav"))
    with open(os.path.join(out_root, "noise", "arbiter.json"), "w") as f:
        json.dump(ns_paths, f, indent=1)
    print(f"arbiter: {len(paths)} speech (= valid_sep voices) + "
          f"{len(ns_paths)} extended-family noises -> {sp_dir}")
    return paths, ns_paths


def _speed_perturb(src_dir, factors=(0.9, 1.1), pseudo=False):
    """Kaldi-style speed perturbation of every wav in ``src_dir``:
    resample by 1/factor (tempo+pitch shift), written alongside the
    originals.  Standard small-corpus augmentation; applied at corpus
    build so the training pipeline itself stays reference-faithful.

    ``pseudo=False``: speaker tags survive (the factor tag is appended
    AFTER the ``spk<ID>_`` prefix) — perturbed copies are extra material
    for the SAME voice.  ``pseudo=True``: the factor tag is folded INTO
    the speaker id (``spk<ID>p<tag>_``), so the speaker-aware separator
    sampler (data/banks.py) treats each resampled voice as a DISTINCT
    identity — resampling shifts pitch and formants together, which is
    the standard pseudo-speaker recipe for thin separation corpora.  A
    side effect is that spkA vs spkAp<tag> becomes a legal (and hard)
    training mixture: near-identical timbre forces the net to rely on
    the context embeddings instead of a voice prior."""
    import re
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
            stem = f
            if pseudo:
                m = re.match(r"^(spk[A-Za-z0-9]+)(_.*)$", f)
                if m:
                    stem = f"{m.group(1)}p{tag}{m.group(2)}"
            # keep every piece within the SEG wire bucket (slowdown can
            # push a SEG-sized segment past it, which would bump every
            # train batch into the next padded-length bucket)
            for j, s0 in enumerate(range(0, len(y), SEG)):
                piece = y[s0:s0 + SEG]
                if len(piece) < 16000:
                    continue
                wavfile.write(os.path.join(
                    src_dir, stem[:-4] + f"_sp{tag}_{j}.wav"), rate, piece)


def _vtlp_warp(x, alpha, sr=16000):
    """Vocal-tract-length perturbation: piecewise-linear frequency warp
    of the STFT (Jaitly & Hinton, ICML-WDL 2013), resynthesized through
    a phase vocoder.  Unlike speed perturbation (which shifts pitch,
    tempo and formants together, keeping the result acoustically close
    to the parent voice), VTLP rescales the SPECTRAL ENVELOPE — the
    standard cheap way to mint genuinely distinct voices from one
    recording.  ``alpha`` < 1 compresses the envelope toward DC (longer
    vocal tract), > 1 stretches it.  Returns int16, same length.

    Resynthesis note: naively gathering complex STFT bins at the warped
    positions and running inverse-STFT does NOT move any energy — the
    inter-frame PHASE of each gathered coefficient still advances at
    the source frequency, and hann overlap-add reconstructs exactly
    that frequency (measured: a 1 kHz tone "warped" by 0.9 came back at
    1 kHz).  Instead of a full phase-vocoder respectralization (which
    corrupts the intra-frame bin-phase structure and rings at the hop
    rate), the warp is applied to the cepstrally-smoothed SPECTRAL
    ENVELOPE only, as a real per-bin gain on the complex STFT: phases
    are untouched so overlap-add stays exactly coherent, harmonic fine
    structure (pitch) is preserved, and the formant envelope moves —
    which is the actual definition of vocal-tract-length change, and
    strictly more voice-distinct than speed perturbation (pitch is a
    speaker-overlapping cue; the envelope is the vocal-tract one)."""
    from scipy.signal import istft, stft
    nper, nover = 400, 240
    _f, _t, Z = stft(np.asarray(x, np.float64), fs=sr, window="hann",
                     nperseg=nper, noverlap=nover)
    nbins = Z.shape[0]
    nyq = sr / 2.0
    freqs = np.linspace(0.0, nyq, nbins)
    # forward warp w(f): slope alpha below the boundary f0, then linear
    # up to Nyquist so the warp is a bijection of [0, nyq]
    fhi = 4800.0
    f0 = fhi * min(alpha, 1.0) / alpha
    w = np.where(freqs <= f0, alpha * freqs,
                 nyq - (nyq - alpha * f0) * (nyq - freqs) / (nyq - f0))
    # output bin g samples the input envelope at f_in = w^{-1}(g)
    src = np.interp(freqs, w, freqs)
    df = freqs[1] - freqs[0]
    lo = np.clip(np.floor(src / df).astype(np.int64), 0, nbins - 1)
    hi = np.minimum(lo + 1, nbins - 1)
    frac = (src / df - lo)[:, None]
    # cepstrally-smoothed log-envelope per frame: keep the low-quefrency
    # coefficients (vocal-tract resonances live there; harmonic combs
    # sit at the pitch quefrency and above, which for speech pitch
    # >= 60 Hz means bins > nper/ (sr/60) ~ 26)
    logmag = np.log(np.abs(Z) + 1e-10)
    cep = np.fft.rfft(logmag, axis=0)
    lifter = np.zeros((cep.shape[0], 1))
    lifter[:24] = 1.0
    lifter[24] = 0.5  # soft edge to reduce Gibbs ripple in the envelope
    env = np.fft.irfft(cep * lifter, n=nbins, axis=0)
    env_warp = env[lo] * (1.0 - frac) + env[hi] * frac
    # real gain, bounded: |gain| in [e^-4, e^4] keeps pathological
    # frames (near-silence) from exploding single bins
    gain = np.exp(np.clip(env_warp - env, -4.0, 4.0))
    Wz = Z * gain
    _t2, y = istft(Wz, fs=sr, window="hann", nperseg=nper, noverlap=nover)
    y = y[:len(x)]
    if len(y) < len(x):
        y = np.pad(y, (0, len(x) - len(y)))
    peak = np.max(np.abs(y)) + 1e-9
    ref_peak = float(np.max(np.abs(np.asarray(x, np.float64))) + 1e-9)
    return np.clip(np.rint(y / peak * ref_peak),
                   -32768, 32767).astype(np.int16)


def _vtlp_perturb(src_dir, alphas=(0.9, 1.1), pseudo=False):
    """Write VTLP-warped copies of every wav in ``src_dir`` alongside the
    originals, as ``<stem>_vt<tag>_<j>.wav``.  Tag = int(alpha*1000)
    (e.g. 900/1100), disjoint from the speed-perturb tag space (09/095/
    105/11) so a speed copy and a VTLP copy of one file never collide.
    ``pseudo=True`` folds ``p<tag>`` into the speaker id, making each
    warped voice a DISTINCT identity for the separator's speaker-aware
    sampler while ``real_speaker_of``'s fixpoint strip (data/banks.py)
    still collapses it to the parent voice — a voice is never PAIRED
    against a formant-shifted copy of itself.  Run BEFORE
    ``_speed_perturb`` so the speed pass multiplies the VTLP voices too
    ((1+V)x(1+S) pseudo-identities per real voice)."""
    import re
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".wav"):
            continue
        rate, x = wavfile.read(os.path.join(src_dir, f))
        for alpha in alphas:
            y = _vtlp_warp(x, alpha, sr=rate)
            tag = str(int(round(alpha * 1000)))
            stem = f
            if pseudo:
                m = re.match(r"^(spk[A-Za-z0-9]+)(_.*)$", f)
                if m:
                    stem = f"{m.group(1)}p{tag}{m.group(2)}"
            for j, s0 in enumerate(range(0, len(y), SEG)):
                piece = y[s0:s0 + SEG]
                if len(piece) < 16000:
                    continue
                wavfile.write(os.path.join(
                    src_dir, stem[:-4] + f"_vt{tag}_{j}.wav"), rate, piece)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/nhans_corpus")
    p.add_argument("--speed_perturb", action="store_true", default=False,
                   help="add 0.9x/1.1x resampled copies of train speech "
                        "and noise (3x corpus)")
    p.add_argument("--speech_perturb_factors", default="0.9,1.1",
                   help="comma-separated speed factors for train SPEECH "
                        "perturbation (each adds a tempo+pitch variant; "
                        "more factors = more pseudo-speaker identities "
                        "for the separator's embedding net)")
    p.add_argument("--vtlp", action="store_true", default=False,
                   help="add vocal-tract-length-perturbed copies of "
                        "train speech (formant-only spectral warp; "
                        "genuinely distinct voice envelopes, unlike "
                        "speed perturbation which shifts pitch+tempo "
                        "together keeping copies acoustically close to "
                        "their parent).  Runs BEFORE --speed_perturb so "
                        "the speed pass multiplies the VTLP voices")
    p.add_argument("--vtlp_alphas", default="0.9,1.1",
                   help="comma-separated VTLP warp factors")
    p.add_argument("--pseudo_speakers", action="store_true", default=False,
                   help="fold the speed-perturb factor tag into the "
                        "speaker id (spk<ID>p<tag>_) so each resampled "
                        "voice counts as a distinct identity for the "
                        "separator's speaker-disjoint sampler — "
                        "len(factors)+1 pseudo-speakers per real one")
    p.add_argument("--sns_train", action="store_true", default=False,
                   help="pool the Selective_Noise_Suppression_samples "
                        "(snsExample*) material into TRAIN: targets + "
                        "denoised of speakers NOT in valid/test (adds "
                        "in-domain LibriSpeech read speech; train is "
                        "otherwise all VoxCeleb-style) and pos/neg "
                        "noise recordings whose AudioSet IDs appear in "
                        "neither eval split (leak-checked by ID)")
    p.add_argument("--separator_holdout", type=int, default=0,
                   help="hold the LAST N separation examples' voices "
                        "out of train and build speech/valid_sep from "
                        "them: a same-domain unseen-speaker separator "
                        "eval split (2N voices, alternating "
                        "target/interferer order)")
    p.add_argument("--residual_voices", action="store_true", default=False,
                   help="extract each separation example's INTERFERENCE "
                        "voice as mixed-denoised (the reference's "
                        "removed.wav convention) and pool it into train "
                        "as spk<ID>tp0_* — a pseudo-variant of the "
                        "example's target-voice group so the "
                        "speaker-disjoint sampler never pairs a voice "
                        "against its own example's residual (which "
                        "carries target traces); doubles the train voice "
                        "count 15->30.  Held-out examples' residuals go "
                        "to valid_sep instead (genuine two-voice eval)")
    p.add_argument("--sns_valid", action="store_true", default=False,
                   help="build the SELECTION split from the snsExample* "
                        "sets whose speaker AND both noise ids are "
                        "absent from the selective+denoising report "
                        "sets (speech/valid = their targets looped, "
                        "noise/valid = [pos,neg] per example in "
                        "EvalLoader pairing order).  Frees the 5 "
                        "selective examples to be a LEAK-FREE report "
                        "set: their speech and noises then appear in "
                        "NO training or selection split")
    p.add_argument("--synth_count", type=int, default=0,
                   help="pool N procedurally synthesized noises "
                        "(tools/synth_noises.py families) into "
                        "noise/train — leak-free by construction; "
                        "replaces the noise-diversity lost when "
                        "--sns_valid removes the selective posNoise "
                        "recordings from train")
    p.add_argument("--silent_noises", type=int, default=6,
                   help="number of all-zero wavs pooled into noise/train "
                        "(reference corpus convention: SilentN files; "
                        "teaches the silent-context regimes)")
    p.add_argument("--only_seen_eval", action="store_true", default=False,
                   help="only (re)build speech/valid_seen from an "
                        "existing corpus at --out (additive; safe next "
                        "to a live run) — the seen-speaker separator "
                        "eval split, see build_seen_eval")
    p.add_argument("--only_arbiter", action="store_true", default=False,
                   help="only (re)build the NEUTRAL ARBITER split "
                        "(speech/arbiter + noise/arbiter) from an "
                        "existing corpus at --out (additive; safe next "
                        "to a live run) — see build_arbiter")
    args = p.parse_args()
    if args.only_seen_eval:
        build_seen_eval(args.out)
        return
    if args.only_arbiter:
        build_arbiter(args.out)
        return

    speech = os.path.join(args.out, "speech")
    noise = os.path.join(args.out, "noise")
    # start clean: stale files from previous builds would leak into splits
    import shutil
    for d in (speech, noise):
        if os.path.isdir(d):
            shutil.rmtree(d)

    # --- speech/train: the separation examples' speaker recordings with
    # per-example speaker tags.  posNoise/negNoise there are SPEAKER
    # recordings (the separator's conditioning contexts); target ~=
    # denoised (same utterance).  Speaker IDs are VoxCeleb-style,
    # disjoint from the denoising/selective examples' LibriSpeech
    # speakers, so neither eval split leaks into training.
    ss = os.path.join(DEMO, "source_separation")
    train_dir = os.path.join(speech, "train")
    examples = sorted(d for d in os.listdir(ss)
                      if os.path.isdir(os.path.join(ss, d)))
    # --separator_holdout N: the LAST N examples' voices never enter
    # train; they become speech/valid_sep — a SAME-DOMAIN unseen-speaker
    # separator eval (the published protocol holds out speakers within
    # one corpus, LibriSpeech train vs test; the LibriSpeech-read-speech
    # "valid" split crosses domains from the VoxCeleb-style training
    # voices, which confounds speaker-generalization with domain
    # transfer — docs/QUALITY.md round-2 analysis).
    held = examples[len(examples) - args.separator_holdout:] \
        if args.separator_holdout else []
    valid_sep = []  # (voice_name, [source paths]) in alternating order
    for i, ex in enumerate(examples):
        exdir = os.path.join(ss, ex)
        tgt_side = (_collect(exdir, "target") + _collect(exdir, "denoised")
                    + _collect(exdir, "posNoise"))
        intf_side = _collect(exdir, "negNoise")
        residual = _residual_int16(exdir) if args.residual_voices else None
        if ex in held:
            # the example dirs ship denoised + mixed only, so each
            # example contributes ONE clean voice (the extracted
            # target); the interferer exists only inside `mixed` —
            # --residual_voices recovers it as mixed-denoised, making
            # the held-out eval a genuine two-voice problem
            for voice, side in ((f"spks{i}t", tgt_side),
                                (f"spks{i}i", intf_side)):
                if side:
                    valid_sep.append((voice, side))
            if residual is not None:
                valid_sep.append((f"spks{i}i", residual))
            continue
        for j, p_ in enumerate(tgt_side):
            _write_int16(p_, train_dir, f"spks{i}t_{j}.wav", segment=SEG)
        for j, p_ in enumerate(intf_side):
            _write_int16(p_, train_dir, f"spks{i}i_{j}.wav", segment=SEG)
        if residual is not None:
            # tp0 = pseudo-variant of THIS example's target-voice group:
            # real_speaker_of collapses spks<i>tp0 (and its perturbed
            # spks<i>tp0p<f> descendants) to spks<i>t, so the sampler
            # never pairs the residual against the voice whose traces
            # it carries; all cross-example pairs remain legal
            _write_int16_array(residual, train_dir, f"spks{i}tp0_r.wav",
                               segment=SEG)
    if valid_sep:
        import json as _json
        vs_dir = os.path.join(speech, "valid_sep")
        os.makedirs(vs_dir, exist_ok=True)
        vs_paths = []
        # alternating t/i voices: EvalLoader pairs utterance i with i+1
        # (wraparound), so consecutive entries being different voices
        # makes every eval mixture a genuine two-speaker problem
        for n, (voice, paths) in enumerate(valid_sep):
            x = (paths if isinstance(paths, np.ndarray)
                 else np.concatenate([_to_int16(p_) for p_ in paths]))
            if len(x) < EVAL_LEN:
                x = np.tile(x, int(np.ceil(EVAL_LEN / len(x))))
            name = f"sep{n:02d}_{voice}.wav"
            wavfile.write(os.path.join(vs_dir, name), 16000, x[:EVAL_LEN])
            vs_paths.append(os.path.join(vs_dir, name))
        with open(os.path.join(speech, "valid_sep.json"), "w") as f:
            _json.dump(vs_paths, f, indent=1)
        print(f"valid_sep: {len(vs_paths)} held-out same-domain voices "
              f"(examples {sorted(held)}) -> {vs_dir}")
    ss_aex = os.path.join(REF, "N_HANS___Source_Separation",
                          "audio_examples")
    for f, tag in (("target_speaker.wav", "aext"),
                   ("noise_speaker.wav", "aexi")):
        p_ = os.path.join(ss_aex, f)
        if os.path.exists(p_):
            _write_int16(p_, train_dir, f"spk{tag}_0.wav", segment=SEG)
    # --- optional: snsExample-based SELECTION split (--sns_valid):
    # examples whose LibriSpeech speaker AND both AudioSet noise ids are
    # absent from the selective+denoising report sets become speech/
    # noise valid, which frees ALL 5 selective examples to be reported
    # leak-free (their material then touches no train/selection split).
    sns_valid_ex = []
    if args.sns_valid:
        report_spk, report_nid = _demo_speakers_and_noise_ids(
            os.path.join(DEMO, "selective_noise_suppression"),
            os.path.join(DEMO, "denoising"))
        for exn, info in sorted(_sns_examples().items()):
            if (info["spk"] in report_spk or info["pos_id"] in report_nid
                    or info["neg_id"] in report_nid
                    or not all(k in info for k in
                               ("target", "posNoise", "negNoise"))):
                continue
            sns_valid_ex.append((exn, info))
        assert sns_valid_ex, "no leak-free sns examples found"

    # --- optional: snsExample* material -> train (leak-checked).  The
    # sns samples partially duplicate the selective examples, so both
    # the LibriSpeech speaker id and the two AudioSet noise ids of every
    # candidate are checked against the report sets AND (with
    # --sns_valid) the selection split before use.
    sns_train_noise = []
    if args.sns_train:
        eval_spk, eval_nid = _demo_speakers_and_noise_ids(
            os.path.join(DEMO, "selective_noise_suppression"),
            os.path.join(DEMO, "denoising"))
        for _exn, info in sns_valid_ex:  # selection material is eval too
            eval_spk.add(info["spk"])
            eval_nid.update((info["pos_id"], info["neg_id"]))
        n_sp, n_ns = 0, 0
        for exn, info in sorted(_sns_examples().items()):
            for kind in ("target", "denoised"):
                if kind in info and info["spk"] not in eval_spk:
                    _write_int16(info[kind], train_dir,
                                 f"spklib{info['spk']}_{exn}{kind[0]}.wav",
                                 segment=SEG)
                    n_sp += 1
            for kind, idk in (("posNoise", "pos_id"),
                              ("negNoise", "neg_id")):
                if kind in info and info[idk] not in eval_nid:
                    sns_train_noise.append(info[kind])
                    n_ns += 1
        print(f"sns_train: +{n_sp} speech wavs (speakers not in "
              f"{sorted(eval_spk)}), +{n_ns} noise recordings")

    if args.vtlp:
        _vtlp_perturb(train_dir,
                      alphas=tuple(float(a) for a in
                                   args.vtlp_alphas.split(",")),
                      pseudo=args.pseudo_speakers)
    if args.speed_perturb:
        _speed_perturb(train_dir,
                       factors=tuple(float(f) for f in
                                     args.speech_perturb_factors.split(",")),
                       pseudo=args.pseudo_speakers)

    sel = os.path.join(DEMO, "selective_noise_suppression")
    if args.sns_valid:
        # --- speech+noise/valid: sns selection split.  Noise file order
        # [pos,neg] per example matches EvalLoader's (2i, 2i+1) pairing,
        # so eval utterance k is mixed with ITS example's true noises.
        for k, (exn, info) in enumerate(sns_valid_ex):
            _write_looped(info["target"], os.path.join(speech, "valid"),
                          f"svalid{k:03d}_ex{exn}.wav")
            _write_int16(info["posNoise"], os.path.join(noise, "valid"),
                         f"sv{2 * k:03d}_ex{exn}pos.wav")
            _write_int16(info["negNoise"], os.path.join(noise, "valid"),
                         f"sv{2 * k + 1:03d}_ex{exn}neg.wav")
        print(f"sns_valid: selection = snsExamples "
              f"{[e for e, _ in sns_valid_ex]}; the 5 selective examples "
              "are leak-free report material (in no train/selection "
              "split)")
    else:
        # --- speech/valid: selection set = selective-suppression targets
        for i, p_ in enumerate(_collect(sel, "target")):
            _write_looped(p_, os.path.join(speech, "valid"),
                          f"sel{i:03d}.wav")

    # --- speech/test: reporting set = denoising targets
    for i, p_ in enumerate(_collect(os.path.join(DEMO, "denoising"),
                                    "target")):
        _write_looped(p_, os.path.join(speech, "test"), f"dn{i:03d}.wav")

    # --- noise/train: selective posNoise + audio_examples noises.
    # Under --sns_valid the selective examples are report-only, so their
    # posNoise recordings must NOT train (material leakage would inflate
    # the model's ability to recognize/keep those exact noises);
    # --synth_count replaces the lost diversity with procedural families.
    train_noise = [] if args.sns_valid else _collect(sel, "posNoise")
    for f in ("exp1_noise.wav", "exp2_noise.wav", "exp1_+noise.wav",
              "exp1_-noise.wav"):
        p_ = os.path.join(AEX, f)
        if os.path.exists(p_):
            train_noise.append(p_)
    train_noise.extend(sns_train_noise)
    for i, p_ in enumerate(train_noise):
        _write_int16(p_, os.path.join(noise, "train"), f"ns{i:03d}.wav",
                     segment=SEG)
    if args.speed_perturb:
        _speed_perturb(os.path.join(noise, "train"))

    # --- noise/train: SILENT files. The published corpus pools silence
    # with the noises (demo set filenames carry pos-noise tags Silent9/
    # Silent10/Silent16, DEMO_N-HANS/denoising/example*/; apply.py:480
    # feeds the same Silent.wav as the +context), so "suppress everything"
    # (pos = silence) and "keep everything" (neg = silence, mixed == target)
    # are both IN-distribution.  Without them the net never sees a silent
    # context and over-suppresses near-clean input at apply time.
    for i in range(args.silent_noises):
        wavfile.write(os.path.join(noise, "train", f"nsilent{i:02d}.wav"),
                      16000, np.zeros(SEG, np.int16))

    if args.synth_count:
        # procedural noise families (leak-free by construction); runs
        # before create_seeds so the manifests include them
        import subprocess
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "synth_noises.py"),
             "--out", os.path.join(noise, "train"),
             "--count", str(args.synth_count), "--seconds", "8",
             "--seed", "0"],
            check=True)

    # --- noise/valid: selective negNoise (held out of train); under
    # --sns_valid the valid noises were written above instead
    if not args.sns_valid:
        for i, p_ in enumerate(_collect(sel, "negNoise")):
            _write_int16(p_, os.path.join(noise, "valid"),
                         f"sel_ns{i:03d}.wav")

    # --- noise/test: denoising negNoise
    for i, p_ in enumerate(_collect(os.path.join(DEMO, "denoising"),
                                    "negNoise")):
        _write_int16(p_, os.path.join(noise, "test"), f"dn_ns{i:03d}.wav")

    from nhans_tpu.data.manifest import create_seeds
    sp = create_seeds(speech)
    ns = create_seeds(noise)
    build_seen_eval(args.out)
    for k in ("train", "valid", "test"):
        print(f"{k}: {len(sp[k])} speech, {len(ns[k])} noise")
    print(f"corpus at {args.out}")


if __name__ == "__main__":
    main()
