"""Device mesh construction and sharding utilities.

The TPU-native replacement for the reference's torch.distributed / DDP stack
(SURVEY.md §2.10, reference train.py:42-45, models/utils/utils.py:62-67):
a global ``jax.sharding.Mesh`` with a ``data`` axis spanning all devices
(ICI within a slice, DCN across), params replicated, batch sharded. Gradient
all-reduce is inserted by XLA from the sharding annotations — no DDP wrapper
or explicit NCCL calls.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multihost bootstrap — the ``init_dist(launcher)`` analogue.

    Reads coordinator settings from args or the standard JAX env vars;
    no-op for single-process runs.
    """
    # honor JAX_PLATFORMS even where a sitecustomize force-selects a
    # platform via jax.config (which overrides the env var): CI and the
    # test suite rely on JAX_PLATFORMS=cpu actually meaning cpu.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if num_processes is None:
        num_processes = int(os.environ.get("SCFLOW_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("SCFLOW_COORDINATOR", "127.0.0.1:9999"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None else int(os.environ.get("SCFLOW_PROCESS_ID", "0")),
    )


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices for data parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
