from . import infer, train

__all__ = ["infer", "train"]
