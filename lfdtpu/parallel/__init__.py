from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch, prefetch_to_device
from .data_parallel import TrainState, make_train_step, make_eval_step, create_train_state
from .distributed import (
    initialize_distributed,
    process_info,
    local_batch_slice,
    global_batch_from_local,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "prefetch_to_device",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
    "initialize_distributed",
    "process_info",
    "local_batch_slice",
    "global_batch_from_local",
]
