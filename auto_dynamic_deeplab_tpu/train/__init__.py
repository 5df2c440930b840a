from .loss import SegmentationLosses, cross_entropy, multi_exit_cross_entropy
from .schedules import lr_schedule
from .step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_search_steps,
    make_single_device_train_step,
    make_train_step,
)

__all__ = [
    "SegmentationLosses",
    "cross_entropy",
    "multi_exit_cross_entropy",
    "lr_schedule",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_search_steps",
    "make_single_device_train_step",
    "make_train_step",
]
