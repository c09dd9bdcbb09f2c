"""Device mesh + sharding utilities.

The reference's entire parallelism story is single-process
`torch.nn.DataParallel` (reference main.py:127).  The TPU-native equivalent
is a named mesh with the batch axis sharded over devices ('data'); XLA
compiles the gradient all-reduce over ICI — there is no NCCL analog to
manage.  Multi-host extension: `jax.distributed.initialize()` before
`create_mesh` and the same code runs across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh. data=-1 uses all local devices."""
    devices = devices if devices is not None else jax.devices()
    if data == -1:
        data = len(devices)
    assert data <= len(devices), f"requested {data} devices, have {len(devices)}"
    return Mesh(np.array(devices[:data]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch pytree with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
