"""Multi-host initialization + spatially-sharded inference.

- ``initialize()``: jax.distributed bootstrap (replaces
  torch.distributed.init_process_group("nccl", env://), train.py:48-53).
  Per-host data sharding then comes from DataLoader(shard=(rank, world)).

- ``spatial_shard_forward``: GSPMD spatial parallelism (the reference's
  "long-context" analogue, SURVEY.md §5): shard the image H dimension over
  the mesh and let XLA insert conv halo exchanges automatically — useful
  when one replica can't hold full-resolution activations.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return (0, 1)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ["NUM_PROCESSES"]),
        process_id=int(process_id or os.environ["PROCESS_ID"]),
    )
    return (jax.process_index(), jax.process_count())


def data_shard() -> tuple:
    """(rank, world) for DataLoader per-host sharding."""
    return (jax.process_index(), jax.process_count())


def spatial_shard_forward(model, variables, mesh: Mesh, axis: str = "data"):
    """Jitted forward with the input sharded along H over ``axis``; XLA/GSPMD
    inserts the conv halo exchanges. Params are replicated."""
    in_sharding = NamedSharding(mesh, P(None, axis, None, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fwd(v, x):
        x = jax.lax.with_sharding_constraint(x, in_sharding)
        outs = model.apply(v, x, train=False)
        return [jax.lax.with_sharding_constraint(o, in_sharding) for o in outs]

    def run(x):
        v = jax.device_put(variables, repl)
        xp = jax.device_put(x, in_sharding)
        return fwd(v, xp)

    return run
