"""Neural-network library: flax.linen modules reproducing the reference's
layer semantics (reference blocks.py, main.py:98-256) on TPU."""

from nhans_tpu.nn.blocks import (
    trunc_normal,
    Dense,
    Conv,
    BatchNorm,
    reverse_gradient,
)
from nhans_tpu.nn.model import (
    PositionalMLP,
    ContextBlock,
    ContextEncoder,
    CondResBlock,
    NHANSNet,
    freq_loss_weights,
    freq_weighted_mse,
)

__all__ = [
    "trunc_normal", "Dense", "Conv", "BatchNorm", "reverse_gradient",
    "PositionalMLP", "ContextBlock", "ContextEncoder", "CondResBlock",
    "NHANSNet", "freq_loss_weights", "freq_weighted_mse",
]
