from . import edge_geometry, fpfh, icp, kabsch, knn, morton, ransac, segment, spectral, svd3  # noqa: F401
