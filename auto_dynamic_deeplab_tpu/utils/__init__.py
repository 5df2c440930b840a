from .flops import count_params, model_complexity, xla_cost
from .meters import AverageMeter
from .metrics import Evaluator, confusion_matrix_update
from .saver import Saver
from .summaries import TrainingSummary

__all__ = [
    "AverageMeter",
    "Evaluator",
    "Saver",
    "TrainingSummary",
    "confusion_matrix_update",
    "count_params",
    "model_complexity",
    "xla_cost",
]

from .profiling import device_time, flops_of, trace
from .restore import copy_state_dict

__all__ += ["copy_state_dict", "device_time", "flops_of", "trace"]
