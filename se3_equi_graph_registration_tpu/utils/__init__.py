from . import timer, trajectory  # noqa: F401
