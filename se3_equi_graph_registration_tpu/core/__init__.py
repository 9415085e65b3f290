from . import quaternions, se3, se3_np  # noqa: F401
