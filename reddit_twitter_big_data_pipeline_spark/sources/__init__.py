from . import ingest, readers  # noqa: F401
