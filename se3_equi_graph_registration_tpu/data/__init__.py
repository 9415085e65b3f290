from . import kitti, pipeline, redwood, sampling, synthetic, threedmatch  # noqa: F401
