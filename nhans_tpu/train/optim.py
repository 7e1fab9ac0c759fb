"""Optimizer zoo via optax, matching the reference's ``--alg`` choices and
the TF optimizers' default hyper-parameters (reference main.py:405-416)."""

from __future__ import annotations

import optax


def make_schedule(lr: float, schedule: str = "constant",
                  decay_steps: int = 0, lr_min_frac: float = 0.1):
    """Optional learning-rate schedule.

    ``constant`` matches the reference (fixed --lr for the whole run,
    reference main.py:405-416).  ``cosine`` decays lr -> lr*lr_min_frac
    over ``decay_steps`` (then holds) — the standard small-data recipe
    that replaces the manual mid-run lr drop the round-1 quality runs
    needed (docs/QUALITY.md).
    """
    if schedule == "constant" or not decay_steps:
        return lr
    if schedule == "cosine":
        return optax.cosine_decay_schedule(
            lr, decay_steps=decay_steps, alpha=lr_min_frac)
    raise ValueError(f"unknown lr schedule {schedule!r}")


def make_optimizer(alg: str, lr, mom: float = 0.0):
    """sgd / momentum / rmsprop / adadelta / adagrad / adam
    (reference main.py:405-416).  Hyper-parameters mirror the TF1 defaults:

    * rmsprop: decay 0.9, momentum = --mom, eps 1e-10
      (tf.train.RMSPropOptimizer defaults)
    * adadelta: rho 0.95, eps 1e-8 (tf.train.AdadeltaOptimizer)
    * adagrad: initial accumulator 0.1 (tf.train.AdagradOptimizer)
    * adam: b1 0.9, b2 0.999, eps 1e-8 (tf.train.AdamOptimizer)
    """
    alg = alg.lower()
    if alg == "sgd":
        return optax.sgd(lr)
    if alg == "momentum":
        return optax.sgd(lr, momentum=mom)
    if alg == "rmsprop":
        # initial_scale=1.0: tf.train.RMSPropOptimizer initializes the
        # mean-square accumulator to ONES (optax defaults to zeros,
        # which makes the first steps ~1/|g| larger) — tests/test_optim.py
        return optax.rmsprop(lr, decay=0.9, eps=1e-10, initial_scale=1.0,
                             momentum=mom if mom else None)
    if alg == "adadelta":
        return optax.adadelta(lr, rho=0.95, eps=1e-8)
    if alg == "adagrad":
        return optax.adagrad(lr, initial_accumulator_value=0.1)
    if alg == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown optimizer --alg={alg!r}; expected one of "
                     "sgd|momentum|rmsprop|adadelta|adagrad|adam")
