from . import debugging, logging, nn_extras, reversible, timer, trajectory  # noqa: F401
