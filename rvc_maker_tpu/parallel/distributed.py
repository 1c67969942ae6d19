"""Multi-host bootstrap + host-local data placement.

Replaces the reference's single-node `dist.init_process_group(nccl|gloo)`
rendezvous (reference train.py:753-755) with `jax.distributed.initialize`
multi-controller SPMD: every host runs the same program, the global mesh
spans all hosts' devices, and XLA collectives ride ICI/DCN.

Environment contract (explicit mode, works for CPU localhost fleets and
ahead-of-time pod bringup):
    RVC_COORDINATOR_ADDRESS  host:port of process 0
    RVC_NUM_PROCESSES        world size
    RVC_PROCESS_ID           this process's rank
On Cloud TPU pods none of these are needed — `jax.distributed.initialize()`
auto-detects from the TPU metadata server; set RVC_MULTIHOST=1 to request
that path.  With neither configured this is a single-process no-op, so
every pipeline can call `ensure_initialized()` unconditionally.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

_INITIALIZED = False


def ensure_initialized() -> bool:
    """Idempotent multi-host bootstrap; returns True if distributed mode
    is active (process_count > 1 possible)."""
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    coord = os.environ.get("RVC_COORDINATOR_ADDRESS", "")
    if coord:
        num = int(os.environ["RVC_NUM_PROCESSES"])
        pid = int(os.environ["RVC_PROCESS_ID"])
        logger.info("jax.distributed.initialize(%s, %d, %d)", coord, num, pid)
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
        _INITIALIZED = True
    elif os.environ.get("RVC_MULTIHOST", "") == "1":
        # TPU pod: coordinator/world auto-detected from platform metadata
        logger.info("jax.distributed.initialize() [auto-detect]")
        jax.distributed.initialize()
        _INITIALIZED = True
    else:
        _INITIALIZED = True  # single-process mode, nothing to do
    return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """Only the primary process writes checkpoints/logs (the reference's
    rank-0 guards, train.py:883-895,919-924)."""
    return process_index() == 0


def global_data_mesh(axis: str = "data"):
    """1-D mesh over ALL processes' devices (global SPMD mesh)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_host_local(batch: Any, mesh, axis: str = "data"):
    """Place per-host batch shards into one global batch array.

    Each process passes its LOCAL slice (global_batch / process_count
    rows); the returned jax.Arrays have a global shape with the leading
    axis sharded over `axis`.  Single-process this degenerates to
    device_put with a sharded layout, so callers need no special-casing.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def _place(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_place, batch)


def local_batch_size(global_batch: int) -> int:
    """Rows this process must supply to shard_host_local."""
    n = process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def sync_global(name: str = "sync") -> None:
    """Barrier across processes (used around checkpoint save/restore)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
