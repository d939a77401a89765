from . import cleanse, dedup, model, multimodal, sampling, similarity, sketches, temporal, text  # noqa: F401
