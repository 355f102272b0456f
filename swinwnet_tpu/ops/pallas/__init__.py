from .window_msa import fused_window_attention, window_attention_reference

__all__ = ["fused_window_attention", "window_attention_reference"]
