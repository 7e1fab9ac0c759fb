"""Supervised training: run ``nhans_train`` in restartable chunks.

Round-2 status: LARGELY OBSOLETE for quality runs.  The axon remote-TPU
plugin leaks the host-side buffer of every host->device transfer
(root-caused in docs/PROFILE.md), which round 1 worked around with this
chunked supervisor; the device-resident corpus banks
(nhans_tpu/data/banks.py, ``--device_corpus auto``) now cut per-step
transfers to ~100 bytes, so single-process runs of any length are fine
whenever the corpus fits the HBM budget.  The supervisor remains useful
as (a) a preemption-recovery harness (resume is SIGKILL-exact,
tests/test_fault_injection.py) and (b) a fallback for corpora too large
for the banks on this leaking client.

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
