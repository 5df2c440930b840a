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

from .tensor import channel_spec, make_tp_train_step, shard_train_state

__all__ += ["channel_spec", "make_tp_train_step", "shard_train_state"]

from .pipeline import PipelinedDynamicInference

__all__ += ["PipelinedDynamicInference"]
