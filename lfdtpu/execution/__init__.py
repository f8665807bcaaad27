from .executor import Executor
from .hooks import (
    Hook,
    Priority,
    get_priority,
    LrSchedulerHook,
    OptimizerHook,
    SpeedHook,
    CheckpointHook,
    EvaluationHook,
    LoggerHook,
    ProfilerHook,
)
from .optim import SGD, GroupedSGD, OptaxOptimizer, bias_param_labels, clip_by_global_norm, global_norm
from .schedules import (
    WarmupSetting,
    MultiStepLRSchedule,
    ConstantLRSchedule,
    CosineLRSchedule,
)
from .torch_convert import (
    convert_reference_state_dict,
    convert_torchvision_resnet,
    load_reference_checkpoint,
)
from .utils import (
    AverageMeter,
    get_root_logger,
    collect_envs,
    customize_exception_hook,
    set_random_seed,
    save_checkpoint,
    load_checkpoint,
)

__all__ = [
    "Executor",
    "Hook", "Priority", "get_priority",
    "LrSchedulerHook", "OptimizerHook", "SpeedHook", "CheckpointHook",
    "EvaluationHook", "LoggerHook", "ProfilerHook",
    "SGD", "GroupedSGD", "OptaxOptimizer", "bias_param_labels", "clip_by_global_norm", "global_norm",
    "WarmupSetting", "MultiStepLRSchedule", "ConstantLRSchedule", "CosineLRSchedule",
    "AverageMeter", "get_root_logger", "collect_envs",
    "customize_exception_hook", "set_random_seed",
    "save_checkpoint", "load_checkpoint",
    "convert_reference_state_dict", "convert_torchvision_resnet",
    "load_reference_checkpoint",
]
