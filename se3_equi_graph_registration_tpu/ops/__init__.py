from . import edge_geometry, kabsch, knn, segment  # noqa: F401
