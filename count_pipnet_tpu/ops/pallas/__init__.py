from .fused_head import fused_count_head, fused_count_head_reference

__all__ = ["fused_count_head", "fused_count_head_reference"]
