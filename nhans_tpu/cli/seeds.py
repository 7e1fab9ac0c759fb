"""``nhans_seeds`` — build dataset manifests
(replaces reference create_seeds.py:90-92)."""

from __future__ import annotations

import argparse

from nhans_tpu.data.manifest import create_seeds


def main() -> None:
    p = argparse.ArgumentParser(prog="nhans_seeds")
    p.add_argument("--speech_wav_dir", default="./speech_wav_dir/")
    p.add_argument("--noise_wav_dir", default="")
    p.add_argument("--format", choices=("json", "pkl"), default="json")
    args = p.parse_args()
    for d in filter(None, [args.speech_wav_dir, args.noise_wav_dir]):
        splits = create_seeds(d, args.format)
        print(f"{d}: " + ", ".join(f"{k}={len(v)}" for k, v in splits.items()))


if __name__ == "__main__":
    main()
