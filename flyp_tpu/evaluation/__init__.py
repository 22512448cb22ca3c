from .zeroshot import get_zeroshot_classifier
from .classifier import Classifier
from .evaluator import evaluate, eval_single_dataset
from . import metrics

__all__ = ["get_zeroshot_classifier", "Classifier", "evaluate", "eval_single_dataset", "metrics"]
