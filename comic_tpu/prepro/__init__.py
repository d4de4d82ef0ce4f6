from . import base, coco, insta, ngrams

__all__ = ["base", "coco", "insta", "ngrams"]
