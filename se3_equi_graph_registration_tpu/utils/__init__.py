from . import (compile_cache, debugging, logging, nn_extras, reversible,  # noqa: F401
               timer, trajectory)
from .compile_cache import enable_compilation_cache  # noqa: F401
