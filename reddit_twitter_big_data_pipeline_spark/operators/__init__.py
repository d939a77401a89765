from . import cleanse, dedup, model, multimodal, sampling, similarity, temporal, text  # noqa: F401
