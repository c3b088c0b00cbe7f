"""Configs, logging, profiling."""

from .config import DataConfig, ExperimentConfig, load_config, save_config
from .logging import MetricsWriter
from .profiling import StepTimer, checked, nan_debug, trace

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
]
