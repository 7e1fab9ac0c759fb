"""Sweep a deterministic eval over many checkpoints of one run, in ONE
process — the compiled eval program is reused across checkpoints, so a
10-checkpoint sweep costs one compile + 10 weight loads instead of 10
process cold-starts.

Used for the seen-speaker separator diagnostic (docs/QUALITY.md): the
training run's periodic eval covers the unseen-speaker valid split; this
tool re-scores saved checkpoints on another split (e.g. ``valid_seen``,
tools/make_demo_corpus.py --only_seen_eval).

Usage:
  python tools/eval_checkpoints.py --task separator \
      --checkpoint_root /tmp/run/ck/nhans --steps 10000,20000,40000 \
      --speech_wav_dir /tmp/nhans_corpus/speech \
      --noise_wav_dir /tmp/nhans_corpus/noise \
      --eval_seeds valid_seen --jsonl /tmp/run/seen.jsonl
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=("denoiser", "separator"),
                   default="separator")
    p.add_argument("--checkpoint_root", required=True,
                   help="orbax run dir holding <step>/ subdirs")
    p.add_argument("--steps", default="",
                   help="comma-separated steps (default: all saved)")
    p.add_argument("--speech_wav_dir", required=True)
    p.add_argument("--noise_wav_dir", required=True)
    p.add_argument("--eval_seeds", default="valid_seen")
    p.add_argument("--eval_utts", type=int, default=0)
    p.add_argument("--eval_pairing", default="wrap",
                   choices=("wrap", "queue"),
                   help="eval noise/speech pairing: wrap = this "
                        "repo's default; queue = the reference's "
                        "queue-order equivalent (config.py, round-5 "
                        "flag) for reference-comparable numbers")
    p.add_argument("--jsonl", default="", help="append records here")
    args = p.parse_args()

    from nhans_tpu.config import Config
    from nhans_tpu.data.loader import EvalLoader
    from nhans_tpu.models import build_model, init_variables
    from nhans_tpu.train.checkpoint import load_variables
    from nhans_tpu.train.evaluate import Evaluator

    import dataclasses
    cfg = (Config.denoiser() if args.task == "denoiser"
           else Config.separator())
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, speech_wav_dir=args.speech_wav_dir,
        noise_wav_dir=args.noise_wav_dir, eval_seeds=args.eval_seeds,
        eval_pairing=args.eval_pairing))

    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
    else:
        steps = sorted(int(d) for d in os.listdir(args.checkpoint_root)
                       if d.isdigit())

    import jax
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    evaluator = Evaluator(cfg, build_model(cfg))
    out = open(args.jsonl, "a") if args.jsonl else None
    for step in steps:
        raw = load_variables(os.path.join(args.checkpoint_root, str(step)))
        variables = {"params": raw["params"],
                     "batch_stats": raw["batch_stats"]}
        loader = EvalLoader(cfg, limit=args.eval_utts or None)
        metrics = evaluator.run(
            variables, loader, step=step, modelname="sweep",
            max_utts=args.eval_utts or None, return_metrics=True)
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        print(json.dumps(rec), flush=True)
        if out:
            out.write(json.dumps(rec) + "\n")
            out.flush()
    if out:
        out.close()


if __name__ == "__main__":
    main()
