from . import fused_attention

__all__ = ["fused_attention"]
