"""Device mesh + sharding rules.

The reference has no distribution story at all — single process, single
GPU, host feed_dict copies (reference main.py:399,560-565; SURVEY.md §2.3).
This module is the communication layer of the rebuild: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for wide-layer sharding), batch sharded over ``data``, parameters
replicated.  Gradient reduction compiles to XLA ``psum`` over ICI —
no NCCL/MPI analog is needed or wanted.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
``jax.devices()`` then spans all hosts and per-host batches are placed via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Mesh over all (or the first data*model) devices: axes (data, model)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None or data <= 0:
        data = len(devices) // model
    if len(devices) < data * model:
        raise ValueError(
            f"make_mesh: requested data={data} x model={model} = "
            f"{data * model} devices but only {len(devices)} visible "
            f"({[str(d) for d in devices]}); for CPU-simulated meshes set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N and force "
            f"jax.config.update('jax_platforms', 'cpu') before backend init")
    devices = devices[:data * model]
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
