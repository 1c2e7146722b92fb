from simxns_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    REPLICA_AXIS,
    create_mesh,
    create_multislice_mesh,
    dp_axes,
    dp_size,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_batch_size,
)
from simxns_tpu.parallel.tp import tp_param_shardings, shard_params
from simxns_tpu.parallel.sync import force_sync
from simxns_tpu.parallel.collectives import (
    all_gather_local_grad,
    all_gather_full_grad,
    gather_in_batch_negatives,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "REPLICA_AXIS",
    "create_mesh",
    "create_multislice_mesh",
    "dp_axes",
    "dp_size",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_size",
    "all_gather_local_grad",
    "all_gather_full_grad",
    "gather_in_batch_negatives",
    "tp_param_shardings",
    "shard_params",
    "force_sync",
]
