from . import edge_geometry, fpfh, icp, kabsch, knn, morton, segment, spectral, svd3  # noqa: F401
