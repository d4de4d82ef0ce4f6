from . import natural_sort, summaries

__all__ = ["natural_sort", "summaries"]
