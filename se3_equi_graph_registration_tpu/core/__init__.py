from . import quaternions, se3  # noqa: F401
