from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .data_parallel import TrainState, make_train_step, make_eval_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
