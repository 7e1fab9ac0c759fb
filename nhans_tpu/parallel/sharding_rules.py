"""Parameter sharding rules for an optional ``model`` mesh axis.

At N-HANS scale (~29M params) data parallelism is the production layout
(SURVEY.md §2.2), but wide layers CAN be sharded over a second mesh axis:
conv kernels [kh, kw, ci, co] and dense kernels [ci, co] with co >= the
threshold get their output-channel dim split over ``model``; XLA's SPMD
partitioner propagates matching activation shardings and inserts the
collectives.  Everything else (biases, BN, small layers) is replicated —
their cost is negligible and replication avoids tiny all-gathers.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_sharding_rules(mesh: Mesh, params: Any,
                         min_channels: int = 256) -> Any:
    """NamedSharding pytree for a params/batch_stats tree."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def rule(path, leaf):
        if model_size > 1 and leaf.ndim >= 2:
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "w" and leaf.shape[-1] >= min_channels \
                    and leaf.shape[-1] % model_size == 0:
                spec = [None] * (leaf.ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def state_sharding(mesh: Mesh, state: Any, use_model_axis: bool = False,
                   min_channels: int = 256) -> Any:
    """Sharding tree for a full TrainState (params + batch_stats +
    opt_state + step).  Optimizer slots follow their parameters."""
    if not use_model_axis:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state)

    def rule(path, leaf):
        if getattr(leaf, "ndim", 0) >= 2:
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "w" and leaf.shape[-1] >= min_channels:
                model_size = dict(zip(mesh.axis_names,
                                      mesh.devices.shape)).get("model", 1)
                if model_size > 1 and leaf.shape[-1] % model_size == 0:
                    spec = [None] * (leaf.ndim - 1) + ["model"]
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)
