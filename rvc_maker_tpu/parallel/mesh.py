"""Device mesh + sharding helpers.

The reference scales by forking one process per GPU with DDP all-reduce
(reference train.py:158-178, SURVEY.md §2.8).  Here scaling is a
jax.sharding.Mesh: batch axes are sharded over 'data', parameters are
replicated, and XLA inserts the collectives (psum for grads, all_gather
for sharded retrieval) over ICI.  No process forking, no NCCL analog —
jax.distributed.initialize() covers multi-host.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices for data parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_leading(x: Any, mesh: Mesh, axis: str = "data"):
    """Place array(s) with the leading (batch) axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), x)


def replicate(tree: Any, mesh: Mesh):
    """Replicate a parameter pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
