"""Model registry: the two published N-HANS task configurations.

The denoiser/selective-suppressor and the source separator share one
architecture and differ only in what the two conditioning contexts mean and
in the training SNR set (reference README.md:47-49; SNR sets
N_HANS___Selective_Noise/reader.py:201 vs
N_HANS___Source_Separation/reader.py:138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nhans_tpu.config import Config
from nhans_tpu.nn.model import NHANSNet


def build_model(cfg: Config) -> NHANSNet:
    return NHANSNet(cfg.model)


def init_variables(cfg: Config, rng: jax.Array, train: bool = True):
    """Initialize model variables with dummy batch-of-1 inputs.

    The init is wrapped in jit: one compiled (and persistently cached)
    program instead of hundreds of eager op dispatches, which matters a
    lot on remote-compile TPU backends.
    """
    model = build_model(cfg)
    m = cfg.model
    mixed = jnp.zeros((1, m.window_frames, m.num_features), jnp.float32)
    ctx = jnp.zeros((1, m.context_frames, m.num_features), jnp.float32)
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(rng, mixed, ctx, ctx, train=train)
    return model, variables


MODELS = {
    "denoiser": Config.denoiser,
    "separator": Config.separator,
}
