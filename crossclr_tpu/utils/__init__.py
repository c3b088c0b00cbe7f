"""Configs, logging, profiling."""

from .config import DataConfig, ExperimentConfig, load_config, save_config
from .logging import MetricsWriter
from .profiling import StepTimer, checked, nan_debug, trace
from .torch_import import (
    dual_encoder_params_from_torch,
    logit_scale_from_torch,
    params_from_torch,
    state_dict_from_params,
)

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "load_config",
    "save_config",
    "MetricsWriter",
    "StepTimer",
    "checked",
    "nan_debug",
    "trace",
    "params_from_torch",
    "dual_encoder_params_from_torch",
    "logit_scale_from_torch",
    "state_dict_from_params",
]
