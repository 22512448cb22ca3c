from .transforms import train_transform, eval_transform, CLIP_MEAN, CLIP_STD
from .csv_dataset import CsvContrastiveDataset
from .loader import DataLoader, prefetch_to_device

__all__ = [
    "train_transform",
    "eval_transform",
    "CLIP_MEAN",
    "CLIP_STD",
    "CsvContrastiveDataset",
    "DataLoader",
    "prefetch_to_device",
]
