from . import audit, graph, social  # noqa: F401
