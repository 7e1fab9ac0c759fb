"""Pick the best checkpoint step from a training summaries JSONL.

Part of the leak-free quality protocol (docs/QUALITY.md): model selection
reads the held-out VALID-split eval trajectory (``<summaries>/nhans.jsonl``,
written by train/metrics.py); the golden-set report then scores only that
step, so selection never sees the reported examples.

Usage:
  python tools/select_best.py <summaries>/nhans.jsonl [metric] [--min_step N]
Prints the best step (by `metric`, default si_sdr_gain) to stdout.
"""

import argparse
import json


def best_step(path: str, key: str = "si_sdr_gain", min_step: int = 1):
    best = None
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in r and r.get("step", 0) >= min_step:
                if best is None or r[key] > best[1]:
                    best = (int(r["step"]), float(r[key]))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("metric", nargs="?", default="si_sdr_gain")
    p.add_argument("--min_step", type=int, default=1)
    args = p.parse_args()
    b = best_step(args.jsonl, args.metric, args.min_step)
    if b is None:
        raise SystemExit(f"no records with metric {args.metric!r}")
    print(b[0])


if __name__ == "__main__":
    main()
