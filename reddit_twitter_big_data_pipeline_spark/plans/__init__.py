from . import graph, social  # noqa: F401
