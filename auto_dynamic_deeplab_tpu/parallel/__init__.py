from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_spec,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_spec",
    "make_mesh",
    "replicate",
    "replicated_spec",
    "shard_batch",
]

from .distributed import data_shard, initialize, spatial_shard_forward

__all__ += ["data_shard", "initialize", "spatial_shard_forward"]
