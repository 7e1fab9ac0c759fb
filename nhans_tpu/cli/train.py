"""``nhans_train`` — training CLI with the reference's documented flags
(reference README.md:68-101: ``python main.py --lr ... --alg ...``).

Extra flags beyond the reference: ``--task denoiser|separator`` (the
reference uses two separate package copies) and ``--data_axis`` for the
mesh size.
"""

from __future__ import annotations

import argparse

from nhans_tpu.config import add_reference_flags, config_from_args


def main() -> None:
    # `kill -USR1 <pid>` on a live run dumps all thread stacks — the
    # first diagnostic for a silent hang (utils/watchdog.py)
    from nhans_tpu.utils.watchdog import install_stack_dump_signal
    install_stack_dump_signal()
    p = argparse.ArgumentParser(prog="nhans_train")
    p.add_argument("--task", choices=("denoiser", "separator"),
                   default="denoiser")
    p.add_argument("--data_axis", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel mesh size: shards the wide conv/"
                        "dense output channels over a 'model' axis "
                        "(parallel/sharding_rules; numerically equal to "
                        "data-parallel, tests/test_sharding.py).  Optional "
                        "at this model scale — data_axis*model_axis must "
                        "divide the device count")
    p.add_argument("--multihost", action="store_true", default=False,
                   help="join the jax.distributed cluster before backend "
                        "init (TPU pods auto-detect; see --coordinator)")
    p.add_argument("--coordinator", default="",
                   help="coordinator address for --multihost on non-pod "
                        "clusters (host:port)")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--eval_utts", type=int, default=16,
                   help="utterances per evaluation pass")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of steps 10-20 here")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="model compute dtype (bfloat16 for peak MXU "
                        "throughput; float32 for strict parity)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize main-tower blocks on backward "
                        "(activation memory for FLOPs)")
    import argparse as _ap
    p.add_argument("--async_eval", action=_ap.BooleanOptionalAction,
                   default=False,
                   help="run periodic eval from checkpoint snapshots on a "
                        "background thread instead of blocking training")
    add_reference_flags(p, inference=False)
    args = p.parse_args()

    if args.multihost:
        from nhans_tpu.parallel.mesh import initialize_multihost
        initialize_multihost(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)

    cfg = config_from_args(args, task=args.task)
    import dataclasses
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, data_axis=args.data_axis, model_axis=args.model_axis,
        profile_dir=args.profile_dir, async_eval=args.async_eval))
    if args.dtype != "float32" or args.remat:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype=args.dtype, remat=args.remat))

    print("----------------------------- FLAGS VALUES "
          "--------------------------------")
    for k in sorted(vars(args)):
        print(f"{k}: {getattr(args, k)}")
    print("----------------------- DATA LOADING, MODEL PREPARING "
          "-------------------------")
    print(f"model_name: {cfg.train.model_name}")

    from nhans_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, eval_utts=args.eval_utts)
    print("--------------------------------- TRAINING! "
          "------------------------------------")
    trainer.train()


if __name__ == "__main__":
    main()
