"""Score this framework against the reference's golden demo corpora.

Runs the denoiser/separator over DEMO_N-HANS example sets (mixed +
contexts) and reports SI-SDR of our output vs the shipped golden
``denoised`` wavs and vs the ``target``.  Meaningful once the published TF
weights are imported (load_denoiser --tf_checkpoint ...); with random
weights it reports the identity baseline.

Usage:
  python tools/validate_demo.py --demo_root /root/reference/DEMO_N-HANS \
      [--checkpoint ckpt_dir] [--task denoiser] [--limit 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def find_examples(root: str, task: str):
    sub = {"denoiser": "denoising",
           "selective": "selective_noise_suppression",
           "separator": "source_separation"}[task]
    base = os.path.join(root, sub)
    out = []
    if not os.path.isdir(base):
        return out
    for ex in sorted(os.listdir(base)):
        d = os.path.join(base, ex)
        if not os.path.isdir(d):
            continue
        files = {f.split("_")[-1].replace(".wav", ""): os.path.join(d, f)
                 for f in os.listdir(d) if f.endswith(".wav")}

        def pick(*keys):
            for k in keys:
                for name, p in files.items():
                    if k in name.lower():
                        return p
            return None

        mixed = pick("mixed")
        golden = pick("denoised", "separated")
        target = pick("target")
        pos = pick("posnoise")
        neg = pick("negnoise", "noise")
        if mixed and golden:
            out.append(dict(name=ex, mixed=mixed, golden=golden,
                            target=target, pos=pos, neg=neg))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demo_root", default="/root/reference/DEMO_N-HANS")
    p.add_argument("--task", default="denoiser",
                   choices=("denoiser", "selective", "separator"))
    p.add_argument("--checkpoint", default="")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    from nhans_tpu.cli._app import load_enhancer
    from nhans_tpu.config import Config
    from nhans_tpu.utils import wavio
    from nhans_tpu.utils.scoring import pesq_score, si_sdr, stoi

    cfg = (Config.separator() if args.task == "separator"
           else Config.denoiser())
    enh = load_enhancer(cfg, args.checkpoint)

    examples = find_examples(args.demo_root, args.task)
    if args.limit:
        examples = examples[:args.limit]
    if not examples:
        print("no examples found")
        return

    for ex in examples:
        mixed = wavio.read_for_processing(ex["mixed"])
        neg = (wavio.read_for_processing(ex["neg"]) if ex["neg"]
               else np.zeros(16000))
        pos = (wavio.read_for_processing(ex["pos"]) if ex["pos"]
               else np.zeros(16000))
        if args.task == "separator":
            ctx_a, ctx_b = neg, pos
        else:
            ctx_a, ctx_b = pos, neg
        out = enh.enhance(mixed, ctx_a, ctx_b)
        den = out["denoised"]
        golden = wavio.read_for_processing(ex["golden"])
        golden = golden / (np.max(np.abs(golden)) + 1e-6)
        row = [f"{ex['name']:12s}",
               f"SI-SDR(ours, golden) = {si_sdr(den, golden):7.2f} dB"]
        if ex["target"]:
            target = wavio.read_for_processing(ex["target"])
            target = target / (np.max(np.abs(target)) + 1e-6)
            mixed_n = out["mixed_processed"]
            row.append(f"SI-SDR(ours, target) = {si_sdr(den, target):7.2f}")
            row.append(f"SI-SDR(mixed, target) = {si_sdr(mixed_n, target):7.2f}")
            row.append(f"STOI(ours) = {stoi(den, target):5.3f}")
            row.append(f"STOI(mixed) = {stoi(mixed_n, target):5.3f}")
            p = pesq_score(den, target)
            if p is not None:
                row.append(f"PESQ = {p:4.2f}")
        print("  ".join(row))


if __name__ == "__main__":
    main()
