from .trainer import Trainer, TrainState, preprocess
from .schedules import BetaSchedule, EarlyStopping, PlateauScheduler, linear_lr

__all__ = [
    "Trainer",
    "TrainState",
    "preprocess",
    "BetaSchedule",
    "EarlyStopping",
    "PlateauScheduler",
    "linear_lr",
]
