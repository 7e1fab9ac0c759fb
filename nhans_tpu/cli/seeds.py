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
    p.add_argument("--split_lists", default="",
                   help="directory of {train,valid,test}.txt utterance-ID "
                        "lists (SPL reproduction splits); resolved against "
                        "--speech_wav_dir")
    args = p.parse_args()
    if args.split_lists:
        from nhans_tpu.data.manifest import create_seeds_from_split_lists
        splits = create_seeds_from_split_lists(
            args.split_lists, args.speech_wav_dir, args.speech_wav_dir,
            fmt=args.format)
        print(f"{args.speech_wav_dir}: " + ", ".join(
            f"{k}={len(v)}" for k, v in splits.items()))
        return
    for d in filter(None, [args.speech_wav_dir, args.noise_wav_dir]):
        splits = create_seeds(d, args.format)
        print(f"{d}: " + ", ".join(f"{k}={len(v)}" for k, v in splits.items()))


if __name__ == "__main__":
    main()
