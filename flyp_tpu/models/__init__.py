from .configs import CLIPConfig, MODEL_CONFIGS, TextConfig, VisionConfig, resolve_model_name
from .clip import CLIPModel, init_clip_params, init_clip_variables
from .head import ClassificationHead
from . import convert

__all__ = [
    "CLIPConfig",
    "TextConfig",
    "VisionConfig",
    "MODEL_CONFIGS",
    "resolve_model_name",
    "CLIPModel",
    "init_clip_params",
    "init_clip_variables",
    "ClassificationHead",
    "convert",
]
