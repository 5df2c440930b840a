"""Device-mesh construction and batch sharding.

Single unified parallelism layer (SURVEY.md §2.2): the reference's three
mechanisms (DataParallel scatter/gather, DDP+NCCL allreduce, thread-futures
SyncBN) collapse into one SPMD program over a `jax.sharding.Mesh` where both
gradient reduction and BN statistics are `lax.pmean` over the 'data' axis,
compiled by XLA onto ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_data_mesh(batch_size: int) -> Optional[Mesh]:
    """Mesh for data-parallel training of ``batch_size`` batches, or None.

    Uses the largest device count that divides ``batch_size`` so every batch
    shards evenly — a mesh wider than the batch would make the step loop drop
    every batch as a ragged tail (a silent no-op training run).
    """
    import math

    n = math.gcd(jax.device_count(), batch_size)
    return make_mesh(n_data=n) if n > 1 else None


def batch_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded on the leading axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
