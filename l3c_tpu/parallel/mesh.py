"""Device mesh + sharding helpers for data-parallel training.

The reference is strictly single-GPU (SURVEY.md section 2.8: DataParallel
explicitly unsupported). Here data parallelism is first-class and
TPU-native: a 1-D `jax.sharding.Mesh` over all chips, batches sharded on
the leading axis, parameters/optimizer state replicated, and XLA inserts
the psum gradient all-reduce over ICI when the jitted train step runs
under the mesh. The model (~5M params) needs no TP/PP; the mesh axis
name is kept separate ('data') so wider layouts can be added without
breaking callers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed():
    """Multi-host initialization (jax.distributed) from environment.

    Set L3C_COORDINATOR=host:port, L3C_NUM_PROCS, L3C_PROC_ID on every
    host BEFORE the first jax use; `jax.devices()` then spans all hosts
    and the same mesh/pjit code runs multi-host (XLA collectives ride
    ICI within a slice / DCN across). No-op when unset, so single-host
    workflows are unaffected."""
    import os
    addr = os.environ.get("L3C_COORDINATOR")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["L3C_NUM_PROCS"]),
        process_id=int(os.environ["L3C_PROC_ID"]))
    return True


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Place a host batch onto the mesh, sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh))


def data_parallel_jit(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch) -> (state, metrics) step for the mesh.

    State is replicated, the batch is sharded on its leading axis; the
    gradient all-reduce appears automatically as an XLA collective over
    ICI (no NCCL-style calls — SURVEY.md section 2.8 TPU-native plan).
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, shard),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
