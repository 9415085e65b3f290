from . import checkpoints, engine, losses, metrics  # noqa: F401
