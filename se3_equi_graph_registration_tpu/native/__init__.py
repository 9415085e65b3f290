from . import max_clique  # noqa: F401
