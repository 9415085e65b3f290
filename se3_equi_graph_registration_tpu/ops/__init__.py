from . import edge_geometry, eig3, fgr, fpfh, icp, kabsch, knn, morton, pose_graph, ransac, segment, spectral, svd3, voxel  # noqa: F401
