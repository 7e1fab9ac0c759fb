"""Device mesh + sharding rules + multi-host hooks.

The reference has no distribution story at all — single process, single
GPU, host feed_dict copies (reference main.py:399,560-565; SURVEY.md §2.3).
This module is the communication layer of the rebuild: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for wide-layer sharding), batch sharded over ``data``, parameters
replicated.  Gradient reduction compiles to XLA ``psum`` over ICI within a
slice (DCN across slices) — no NCCL/MPI analog is needed or wanted.

Multi-host: ``initialize_multihost()`` (or ``nhans_train --multihost``)
before ``make_mesh``; ``jax.devices()`` then spans all hosts,
``process_shard`` splits manifests per host, and ``shard_batch`` places
per-host batches via ``jax.make_array_from_process_local_data``.
Validated by tests/test_multihost.py (2-process CPU cluster).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> None:
    """Join the jax.distributed cluster (call BEFORE any backend init).

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU clusters pass coordinator/num_processes/process_id explicitly.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_shard(items: list, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """Deterministic per-host slice of a manifest: host ``i`` of ``n``
    reads ``items[i::n]``.  Falls back to the full list when the shard
    would be empty (tiny manifests)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    shard = items[pi::pc]
    return shard if shard else list(items)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-host utterance count: the global batch divided over hosts,
    rounded up so every host feeds its local devices."""
    pc = jax.process_count()
    per = -(-global_batch // pc)
    local_dev = max(len(mesh.local_devices), 1)
    return -(-per // local_dev) * local_dev


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
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Single-process: plain ``device_put``.  Multi-host: each process holds
    its local slice of the global batch and assembly goes through
    ``jax.make_array_from_process_local_data`` (the global batch size is
    local_size * process_count along the leading axis)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
