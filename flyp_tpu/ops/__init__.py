from .attention import multi_head_attention
from .losses import clip_loss

__all__ = ["multi_head_attention", "clip_loss"]
