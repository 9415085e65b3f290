from . import edge_geometry, fpfh, icp, kabsch, knn, morton, pose_graph, ransac, segment, spectral, svd3  # noqa: F401
