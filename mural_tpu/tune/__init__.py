from mural_tpu.tune.space import Choice, LogUniform, SampleFrom, sample_config
from mural_tpu.tune.asha import ASHAScheduler
from mural_tpu.tune.runner import run_experiment, ExperimentOptions

__all__ = ["Choice", "LogUniform", "SampleFrom", "sample_config",
           "ASHAScheduler", "run_experiment", "ExperimentOptions"]
