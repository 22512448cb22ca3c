from .attention import multi_head_attention
from .losses import clip_loss
from .fused_qkv_attention import fused_qkv_attention

__all__ = ["multi_head_attention", "clip_loss", "fused_qkv_attention"]
