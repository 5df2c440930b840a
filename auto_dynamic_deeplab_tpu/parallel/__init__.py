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
