from . import stateful, streams  # noqa: F401
