"""Average the inference variables of several checkpoints of one run
(tail/SWA averaging) into a new standalone checkpoint directory.

Late-training checkpoints of the small-corpus quality runs oscillate in
WHICH near-clean input they over-suppress (docs/QUALITY.md: adjacent
checkpoints trade example-level regressions while the held-out mean
moves little).  Uniform parameter averaging over the cosine-decay tail
(Polyak/SWA; Izmailov et al. 2018) damps that oscillation without
touching the training recipe, and stays leak-free: the averaged model
is just one more CANDIDATE scored on the selection split, never on the
reported golden set.

BatchNorm population statistics are averaged too — the tail
checkpoints' EMA stats are near-stationary (same corpus, decayed lr),
measured drift << the EMA window — so no re-estimation pass is needed.

Usage:
  python tools/ckpt_average.py --checkpoint_root /tmp/q/ck/nhans \
      --steps 70000,72500,75000,77500,80000 --out /tmp/q/ck_avg
  # then: tools/validate_demo.py --checkpoint /tmp/q/ck_avg ...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def average_variables(var_trees):
    """Uniform elementwise mean over a list of {params, batch_stats}.

    Floating-point leaves are averaged in float64 and emitted float32;
    integer leaves (none expected in inference variables) pass through
    from the first tree.
    """
    import jax

    def mean_leaf(*leaves):
        a = np.asarray(leaves[0])
        if not np.issubdtype(a.dtype, np.floating):
            return a
        acc = np.zeros(a.shape, np.float64)
        for leaf in leaves:
            acc += np.asarray(leaf, np.float64)
        return (acc / len(leaves)).astype(np.float32)

    return jax.tree_util.tree_map(mean_leaf, *var_trees)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_root", required=True,
                   help="orbax run dir holding <step>/ subdirs "
                        "(e.g. <ckdir>/nhans)")
    p.add_argument("--steps", required=True,
                   help="comma-separated steps to average")
    p.add_argument("--out", required=True,
                   help="output checkpoint dir (save_variables format, "
                        "accepted by every --checkpoint flag)")
    args = p.parse_args()

    from nhans_tpu.train.checkpoint import load_variables, save_variables

    steps = [int(s) for s in args.steps.split(",")]
    trees = []
    for s in steps:
        path = os.path.join(args.checkpoint_root, str(s))
        v = load_variables(path)
        trees.append({"params": v["params"],
                      "batch_stats": v["batch_stats"]})
        print(f"loaded step {s}")
    avg = average_variables(trees)
    save_variables(args.out, avg)
    print(f"averaged {len(steps)} checkpoints {steps} -> {args.out}")


if __name__ == "__main__":
    main()
