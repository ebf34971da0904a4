from .attention import fused_attention
from .fused import modulated_layer_norm

__all__ = ["fused_attention", "modulated_layer_norm"]
