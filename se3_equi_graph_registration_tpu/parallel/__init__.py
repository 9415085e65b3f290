from . import distributed, mesh, point_sharding  # noqa: F401
from .distributed import (  # noqa: F401
    global_mesh, host_local_to_global, init_distributed, process_shard_info)
from .mesh import data_sharding, make_mesh, replicated, shard_pair_batch  # noqa: F401
from .point_sharding import (  # noqa: F401
    halo_sharded_egnn_forward, halo_sharded_egnn_forward_batched,
    halo_sharded_knn, halo_sharded_knn_batched,
    make_point_sharded_train_step, shard_points_batch, sharded_egnn_forward,
    sharded_egnn_forward_batched, sharded_knn, sharded_knn_batched)
