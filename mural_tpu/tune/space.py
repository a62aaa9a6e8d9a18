"""Hyperparameter search-space primitives.

Replaces Ray Tune's samplers (ref scripts/run_train_raytune.py:246-282):
``tune.choice`` -> :class:`Choice`, ``tune.loguniform`` ->
:class:`LogUniform`, ``tune.sample_from`` -> :class:`SampleFrom`
(evaluated after all other dimensions, receiving the partial config).
In standalone (non-search) mode the reference takes the first element of
each flag list (:186-222); ``first_element_config`` mirrors that.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Sequence

import numpy as np


@dataclass
class Choice:
    options: Sequence

    def sample(self, rng: np.random.Generator):
        return self.options[int(rng.integers(0, len(self.options)))]


@dataclass
class LogUniform:
    low: float
    high: float

    def sample(self, rng: np.random.Generator):
        return float(np.exp(rng.uniform(np.log(self.low),
                                        np.log(self.high))))


@dataclass
class SampleFrom:
    fn: Callable[[Dict], Any]


def sample_config(space: Dict, rng: np.random.Generator) -> Dict:
    config = {}
    deferred = {}
    for k, v in space.items():
        if isinstance(v, (Choice, LogUniform)):
            config[k] = v.sample(rng)
        elif isinstance(v, SampleFrom):
            deferred[k] = v
        else:
            config[k] = v
    for k, v in deferred.items():
        config[k] = v.fn(config)
    return config


def loguniform_or_choice(values: Sequence[float]):
    """The reference uses loguniform(values[0], values[1]) for
    learning_rate/weight_decay in search mode (run_train_raytune.py:
    256,261); with a single value it degenerates to that value."""
    if len(values) >= 2:
        return LogUniform(values[0], values[1])
    return values[0]
