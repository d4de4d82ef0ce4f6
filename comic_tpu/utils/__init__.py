from . import io, natural_sort, net_params, profiling, summaries

__all__ = ["io", "natural_sort", "net_params", "profiling", "summaries"]
