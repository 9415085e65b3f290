from . import logging, timer, trajectory  # noqa: F401
