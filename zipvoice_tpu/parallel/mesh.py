"""Device mesh + sharding rules.

The reference's only parallelism is DDP over NCCL (ref zipvoice/utils/
common.py:181-203, SURVEY.md §2.10).  The TPU-native equivalent is a 1-D
``data`` mesh: batch sharded over ICI, parameters/optimizer state replicated,
gradient psum inserted by XLA from the sharding annotations.  A second
``model`` axis is provisioned for tensor-parallel extensions at larger
scales (unused at 123M, where DP is compute-optimal).

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
then spans all processes and batches shard per-host over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
