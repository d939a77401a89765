from . import cleanse, dedup, model, multimodal, similarity, text  # noqa: F401
