from . import cleanse, model  # noqa: F401
