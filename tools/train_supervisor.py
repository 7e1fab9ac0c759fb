"""Supervised training: run ``nhans_train`` in restartable chunks.

Why: the axon remote-TPU plugin in this environment leaks the host-side
buffer of EVERY host->device transfer (~batch-size bytes per step;
verified with a device_put microbenchmark — 32 MB leaked per 32 MB put,
`.delete()` included), so a long single-process run is OOM-killed once
RSS hits host RAM.  Checkpoint auto-resume (train/trainer.py) makes the
fix trivial: train in chunks of N steps, one process per chunk.

This is an ENVIRONMENT workaround, not framework architecture: on a
normally attached TPU (PCIe/pod) the supervisor is unnecessary but
harmless — it doubles as preemption-recovery demonstration.

Usage:
  python tools/train_supervisor.py --target 40000 --chunk 5000 \
      -- --task denoiser --speech_wav_dir ... [nhans_train args]
"""

import argparse
import os
import re
import subprocess
import sys


def latest_step(ckpt_dir: str, name: str = "nhans") -> int:
    path = os.path.join(ckpt_dir, name)
    if not os.path.isdir(path):
        return 0
    steps = [int(d) for d in os.listdir(path) if re.fullmatch(r"\d+", d)]
    return max(steps, default=0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=int, required=True)
    p.add_argument("--chunk", type=int, default=5000,
                   help="steps per process incarnation (multiple of "
                        "eval_every so every incarnation ends on a "
                        "checkpoint)")
    p.add_argument("--max_retries", type=int, default=3,
                   help="consecutive no-progress crashes tolerated")
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="-- then nhans_train args (must include "
                        "--checkpoint_dir)")
    args = p.parse_args()
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    try:
        ckpt_dir = rest[rest.index("--checkpoint_dir") + 1]
    except ValueError:
        print("supervisor: --checkpoint_dir required in nhans_train args",
              file=sys.stderr)
        sys.exit(2)

    retries = 0
    while True:
        start = latest_step(ckpt_dir)
        if start >= args.target:
            print(f"supervisor: target {args.target} reached "
                  f"(latest checkpoint step {start})")
            return
        stop = min(start + args.chunk, args.target)
        cmd = [sys.executable, "-m", "nhans_tpu.cli.train",
               *rest, "--batches", str(stop)]
        print(f"supervisor: [{start} -> {stop}] {' '.join(cmd)}",
              flush=True)
        rc = subprocess.call(cmd)
        made_progress = latest_step(ckpt_dir) > start
        if rc != 0 and not made_progress:
            retries += 1
            print(f"supervisor: chunk failed rc={rc} with no progress "
                  f"(retry {retries}/{args.max_retries})", flush=True)
            if retries > args.max_retries:
                sys.exit(rc)
        else:
            retries = 0


if __name__ == "__main__":
    main()
