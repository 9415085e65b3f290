from . import edge_geometry, fpfh, kabsch, knn, morton, segment, spectral, svd3  # noqa: F401
