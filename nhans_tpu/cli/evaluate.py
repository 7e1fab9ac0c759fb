"""``nhans_evaluate`` — standalone deterministic evaluation.

The reference runs test-set evaluation through the training entry point
with ``eval_before_training=True, eval_after_training=False`` and
``--eval_seeds test`` (reference main.py:30-32,552-555).  This command does
the same job directly: load a checkpoint, run the md5-deterministic eval
over the chosen split, print loss + SI-SDR, optionally dump
reconstruction wavs.
"""

from __future__ import annotations

import argparse

from nhans_tpu.config import add_reference_flags, config_from_args


def main() -> None:
    p = argparse.ArgumentParser(prog="nhans_evaluate")
    p.add_argument("--task", choices=("denoiser", "separator"),
                   default="denoiser")
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint (from nhans_train or "
                        "load_denoiser/load_separator)")
    p.add_argument("--eval_utts", type=int, default=0,
                   help="limit utterances (0 = whole split)")
    add_reference_flags(p, inference=False)
    args = p.parse_args()
    cfg = config_from_args(args, task=args.task)

    import jax
    import numpy as np
    from nhans_tpu.data.loader import EvalLoader
    from nhans_tpu.models import build_model, init_variables
    from nhans_tpu.train.evaluate import Evaluator

    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)
    if args.checkpoint:
        from nhans_tpu.train.checkpoint import load_variables
        raw = load_variables(args.checkpoint)  # raw restore, any layout
        # accept both {'params','batch_stats'} and full TrainState trees
        variables = {"params": raw["params"],
                     "batch_stats": raw["batch_stats"]}
    evaluator = Evaluator(cfg, build_model(cfg))
    loader = EvalLoader(cfg, limit=args.eval_utts or None)
    print(cfg.data.eval_seeds)
    metrics = evaluator.run(
        variables, loader, step=0, modelname=cfg.train.model_name,
        wav_dump_folder=cfg.train.wav_dump_folder or None,
        dump_results=cfg.train.dump_results or None,
        max_utts=args.eval_utts or None, return_metrics=True)
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
