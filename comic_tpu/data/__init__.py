from . import captions, pipeline, preprocessing, synthetic

__all__ = ["captions", "pipeline", "preprocessing", "synthetic"]
