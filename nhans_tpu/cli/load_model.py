"""``load_denoiser`` / ``load_separator`` — model fetch/prepare commands.

The reference's setup.py points these at a PyPI-only ``load_model.py`` that
does not exist in its repo (reference setup.py:45-48).  Here they are real:
they prepare a ready-to-use checkpoint directory, either by converting a
published TF N-HANS checkpoint (via nhans_tpu.compat) or by initializing a
fresh model.
"""

from __future__ import annotations

import argparse
import sys


def _run(task: str) -> None:
    p = argparse.ArgumentParser(prog=f"load_{task}")
    p.add_argument("--tf_checkpoint", default="",
                   help="path prefix of a TF N-HANS checkpoint "
                        "(e.g. .../81448_0-1000000) to convert")
    p.add_argument("--output", default=f"./{task}_ckpt",
                   help="directory to write the converted/initialized "
                        "orbax checkpoint into")
    args = p.parse_args()

    import jax
    from nhans_tpu.config import Config
    from nhans_tpu.models import init_variables
    from nhans_tpu.train.checkpoint import save_variables

    cfg = Config.denoiser() if task == "denoiser" else Config.separator()
    _, variables = init_variables(cfg, jax.random.PRNGKey(0), train=False)

    if args.tf_checkpoint:
        from nhans_tpu.compat.tf_import import import_tf_checkpoint
        variables = import_tf_checkpoint(args.tf_checkpoint, variables, task)
        print(f"converted TF checkpoint {args.tf_checkpoint}")
    else:
        print("WARNING: no --tf_checkpoint given; writing a fresh random "
              "initialization.", file=sys.stderr)
    save_variables(args.output, variables)
    print(f"wrote checkpoint to {args.output}")


def main_denoiser() -> None:
    _run("denoiser")


def main_separator() -> None:
    _run("separator")


if __name__ == "__main__":
    main_denoiser()
