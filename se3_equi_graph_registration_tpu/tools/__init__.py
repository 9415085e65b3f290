from . import eval_files, stats, viz  # noqa: F401
