from . import edge_geometry, fpfh, kabsch, knn, morton, segment, svd3  # noqa: F401
