from . import mesh, point_sharding  # noqa: F401
from .mesh import data_sharding, make_mesh, replicated, shard_pair_batch  # noqa: F401
from .point_sharding import sharded_egnn_forward, sharded_knn  # noqa: F401
