from . import graph_sink, writers  # noqa: F401
