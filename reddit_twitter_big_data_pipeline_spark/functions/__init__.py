from . import enrich  # noqa: F401
