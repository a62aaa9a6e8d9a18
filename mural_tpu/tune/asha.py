"""Asynchronous Successive Halving (ASHA) in plain Python.

Replaces ``ray.tune.schedulers.ASHAScheduler`` (ref
run_train_raytune.py:285-292): rungs at
``grace_period * reduction_factor**k`` up to ``max_t``; when a trial
reports at a rung it continues only if its metric is within the best
``1/reduction_factor`` fraction of all results recorded at that rung so
far (asynchronous promotion -- no waiting for stragglers).
"""

from __future__ import annotations

import threading
from typing import Dict, List


class ASHAScheduler:
    def __init__(self, metric: str = "loss", mode: str = "min",
                 max_t: int = 10, grace_period: int = 5,
                 reduction_factor: int = 2):
        self.metric = metric
        self.sign = 1.0 if mode == "min" else -1.0
        self.reduction_factor = reduction_factor
        self.rungs: List[int] = []
        r = grace_period
        while r < max_t:
            self.rungs.append(r)
            r *= reduction_factor
        self._results: Dict[int, List[float]] = {r: [] for r in self.rungs}
        self._lock = threading.Lock()

    def on_report(self, trial_id: str, training_iteration: int,
                  metrics: Dict) -> bool:
        """Returns False when the trial should be stopped."""
        value = self.sign * float(metrics[self.metric])
        with self._lock:
            for rung in self.rungs:
                if training_iteration == rung:
                    results = self._results[rung]
                    results.append(value)
                    k = max(len(results) // self.reduction_factor, 1)
                    cutoff = sorted(results)[k - 1]
                    if value > cutoff:
                        return False
        return True
