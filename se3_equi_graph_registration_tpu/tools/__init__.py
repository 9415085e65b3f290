from . import stats, viz  # noqa: F401
