"""Procedural noise synthesis for context-conditioning generality.

The published reference models train on the full AudioSet ontology
(reference README.md:19-23) — thousands of distinct noise types — which
is what teaches the context towers to *condition on the provided noise
recording* rather than memorize a closed noise set.  This environment
has only ~17 leak-checked real noises (DEMO selective/positive contexts
+ audio_examples), so a denoiser trained on them alone can fit the bank
and under-use the context pathway; the symptom is weak suppression on
golden noises it never saw (tonal content especially).

This tool writes N procedurally generated noise files spanning the main
perceptual noise families, each with randomized parameters so no two
files repeat:

* harmonic stacks (f0, partial count/decay, vibrato, AM) — music-like /
  siren-like tonal noise,
* linear & exponential chirps (up/down, repeated),
* narrowband noise (white noise through random biquad bandpasses) —
  hum / machine bands,
* impulse trains (random rate/jitter/decay) — clicks, engines,
* amplitude-modulated broadband noise (babble-/wind-like envelopes),
* mixtures of the above.

Purely synthetic => leak-free by construction (no golden-example
material).  Files are written as ``nsyn###.wav`` 16-bit mono at the
corpus rate, segmented to SEG samples like make_demo_corpus noises.

Usage:
  python tools/synth_noises.py --out /tmp/corpus/noise/train --count 48 \
      [--seconds 8] [--seed 0]
"""

import argparse
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import butter, lfilter

FS = 16000


def _norm(x: np.ndarray) -> np.ndarray:
    x = x - np.mean(x)
    peak = np.max(np.abs(x)) + 1e-9
    return (x / peak * 0.7 * 32767).astype(np.int16)


def harmonic_stack(rng, n):
    t = np.arange(n) / FS
    f0 = rng.uniform(80, 1200)
    npart = rng.integers(1, 12)
    decay = rng.uniform(0.3, 0.95)
    vib_hz = rng.uniform(0, 8)
    vib_amt = rng.uniform(0, 0.03) * f0
    am_hz = rng.uniform(0, 6)
    am_depth = rng.uniform(0, 0.8)
    phase_mod = vib_amt / max(vib_hz, 1e-3) * np.sin(2 * np.pi * vib_hz * t)
    x = np.zeros(n)
    for k in range(1, npart + 1):
        x += decay ** (k - 1) * np.sin(
            2 * np.pi * k * (f0 * t + phase_mod) + rng.uniform(0, 2 * np.pi))
    x *= 1.0 - am_depth * 0.5 * (1 + np.sin(2 * np.pi * am_hz * t))
    return x


def chirp(rng, n):
    t = np.arange(n) / FS
    reps = rng.integers(1, 6)
    f_lo = rng.uniform(100, 2000)
    f_hi = f_lo * rng.uniform(1.5, 8.0)
    if rng.random() < 0.5:
        f_lo, f_hi = f_hi, f_lo
    tt = (t * reps) % (n / FS / reps) * reps  # repeated sweep
    frac = tt / (n / FS)
    if rng.random() < 0.5:  # exponential sweep
        f = f_lo * (f_hi / f_lo) ** frac
    else:
        f = f_lo + (f_hi - f_lo) * frac
    phase = 2 * np.pi * np.cumsum(f) / FS
    return np.sin(phase)


def narrowband(rng, n):
    x = rng.standard_normal(n)
    out = np.zeros(n)
    for _ in range(rng.integers(1, 4)):
        lo = rng.uniform(100, 5000)
        hi = lo * rng.uniform(1.1, 2.5)
        hi = min(hi, 7600)
        b, a = butter(2, [lo / (FS / 2), hi / (FS / 2)], btype="band")
        out += lfilter(b, a, x) * rng.uniform(0.3, 1.0)
    return out


def impulse_train(rng, n):
    rate = rng.uniform(2, 80)  # impulses / s
    jitter = rng.uniform(0, 0.5)
    x = np.zeros(n)
    pos = 0.0
    while pos < n:
        i = int(pos)
        if i < n:
            x[i] = rng.uniform(0.5, 1.0) * (1 if rng.random() < 0.9 else -1)
        pos += FS / rate * (1 + jitter * rng.uniform(-1, 1))
    # ring each impulse through a random resonator
    b, a = butter(2, rng.uniform(0.02, 0.6))
    return lfilter(b, a, x)


def am_broadband(rng, n):
    t = np.arange(n) / FS
    x = rng.standard_normal(n)
    if rng.random() < 0.7:  # colour it
        b, a = butter(1, rng.uniform(0.05, 0.9))
        x = lfilter(b, a, x)
    env_hz = rng.uniform(0.3, 12)
    depth = rng.uniform(0.3, 1.0)
    env = 1 - depth * 0.5 * (1 + np.sin(2 * np.pi * env_hz * t
                                        + rng.uniform(0, 2 * np.pi)))
    return x * env


def sawtooth_buzz(rng, n):
    """Band-limited sawtooth with drifting f0 — harmonically DENSE
    (every partial at 1/k), structurally unlike harmonic_stack's
    geometric-decay sine stacks.  Buzzer / power-line / engine-rev."""
    t = np.arange(n) / FS
    f0 = rng.uniform(50, 400)
    drift = rng.uniform(-0.3, 0.3)  # octaves over the clip
    f = f0 * 2.0 ** (drift * t / t[-1])
    phase = 2 * np.pi * np.cumsum(f) / FS
    x = np.zeros(n)
    kmax = int(7600 / max(f0, f0 * 2.0 ** drift))
    for k in range(1, max(2, min(kmax, 60))):
        x += np.sin(k * phase) / k
    return x


def gated_bursts(rng, n):
    """Broadband noise through a random on/off gate (jackhammer /
    typing / machine-gun): silence-separated energy bursts, a temporal
    structure none of the base families produce."""
    x = rng.standard_normal(n)
    if rng.random() < 0.5:
        b, a = butter(1, rng.uniform(0.1, 0.9))
        x = lfilter(b, a, x)
    gate = np.zeros(n)
    pos = 0
    while pos < n:
        on = int(rng.uniform(0.01, 0.15) * FS)
        off = int(rng.uniform(0.03, 0.4) * FS)
        gate[pos:pos + on] = 1.0
        pos += on + off
    # soften gate edges (5 ms ramps) so bursts aren't clicks
    ramp = np.ones(int(0.005 * FS))
    gate = np.convolve(gate, ramp / len(ramp), mode="same")
    return x * gate


def tonal_cluster(rng, n):
    """Inharmonic partial cluster with per-partial exponential decay,
    re-struck at random times — bell / metallic-impact spectra (partial
    ratios drawn uniformly, NOT integer multiples)."""
    t = np.arange(n) / FS
    x = np.zeros(n)
    base = rng.uniform(200, 2000)
    ratios = np.sort(rng.uniform(1.0, 6.3, size=rng.integers(3, 9)))
    strikes = sorted(rng.uniform(0, 0.8 * n / FS,
                                 size=rng.integers(1, 5)))
    for s in strikes:
        dt = np.clip(t - s, 0, None)
        active = dt > 0
        for r in ratios:
            tau = rng.uniform(0.2, 2.0)
            x[active] += (np.exp(-dt[active] / tau)
                          * np.sin(2 * np.pi * base * r * dt[active])
                          * rng.uniform(0.3, 1.0))
    return x


FAMILIES = (harmonic_stack, chirp, narrowband, impulse_train, am_broadband)

# Families introduced for the round-5 NEUTRAL ARBITER split
# (docs/QUALITY.md): the base FAMILIES seeded v4 training noise, so an
# arbiter drawing from them would hand the v4-trained finalist an
# in-distribution advantage.  These three are structurally disjoint
# (dense-harmonic sawtooth, gated temporal bursts, inharmonic clusters)
# and are used ONLY by --families extended builds.
EXTENDED_FAMILIES = (sawtooth_buzz, gated_bursts, tonal_cluster)


def synth_one(rng, n, families=FAMILIES):
    fams = list(rng.permutation(len(families)))
    x = families[fams[0]](rng, n)
    x = x / (np.std(x) + 1e-9)
    if rng.random() < 0.35 and len(families) > 1:  # mixture of two
        y = families[fams[1]](rng, n)
        x = x + y / (np.std(y) + 1e-9) * rng.uniform(0.3, 1.0)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--count", type=int, default=48)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prefix", default="nsyn")
    p.add_argument("--families", choices=("base", "extended"),
                   default="base",
                   help="base = the 5 training families; extended = the "
                        "3 arbiter-only families (structurally disjoint "
                        "from every training noise source)")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n = int(args.seconds * FS)
    fams = FAMILIES if args.families == "base" else EXTENDED_FAMILIES
    for i in range(args.count):
        x = synth_one(rng, n, families=fams)
        wavfile.write(os.path.join(args.out, f"{args.prefix}{i:03d}.wav"),
                      FS, _norm(x))
    print(f"wrote {args.count} synthetic noises ({args.seconds:.0f}s each) "
          f"to {args.out}")

    # Refresh the split manifest if the target is a manifest-managed
    # corpus dir (<root>/<split>/ with <root>/<split>.json beside it):
    # loaders read the manifest, not the directory, so without this the
    # new files would be silently ignored.
    root, split = os.path.split(os.path.normpath(args.out))
    manifest = os.path.join(root, f"{split}.json")
    if os.path.exists(manifest):
        import json
        paths = sorted(
            os.path.join(r, f) for r, _d, fs in os.walk(args.out)
            for f in fs if f.endswith(".wav"))
        with open(manifest, "w") as f:
            json.dump(paths, f, indent=0)
        print(f"refreshed manifest {manifest}: {len(paths)} wavs")


if __name__ == "__main__":
    main()
