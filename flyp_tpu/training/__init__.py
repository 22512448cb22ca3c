from .schedules import warmup_cosine_lr, crestart_lr, make_scheduler
from .train_state import TrainState, create_train_state, make_optimizer
from .train_step import make_train_step
from .grad_cache import make_chunked_train_step

__all__ = [
    "warmup_cosine_lr",
    "crestart_lr",
    "make_scheduler",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_chunked_train_step",
]
