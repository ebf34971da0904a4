from .attention import fused_attention
from .fused import modulated_layer_norm

__all__ = ["fused_attention", "modulated_layer_norm"]
# fused_attention self-selects between the single-tile kernel (short
# sequences) and the flash (KV-blocked online-softmax) kernel (long
# sequences, e.g. FLUX-1024's 4608 joint tokens) — see ops/attention.py.
