from .build import (
    build_optimizer,
    current_learning_rate,
    lr_for_epoch,
    set_learning_rate,
)

__all__ = [
    "build_optimizer",
    "current_learning_rate",
    "lr_for_epoch",
    "set_learning_rate",
]
