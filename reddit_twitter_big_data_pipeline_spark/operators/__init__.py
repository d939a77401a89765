from . import cleanse, dedup, model, multimodal, similarity, temporal, text  # noqa: F401
