"""Poisson calibration (ref MuRaL/model/calibration.py:10-23).

Interprets prob0 (the no-mutation class) through a Poisson rate:
lambda = -log(prob0); mutated-class probabilities are rescaled by
lambda / (1 - prob0) and prob0 becomes 1 - lambda.  Applied always for
INDEL predictions and opt-in (--poisson_calib) for SNV
(training.py:484-485, run_predict.py:224-225).
"""

from __future__ import annotations

import numpy as np


def poisson_calibrate(probs):
    """Accepts a pandas DataFrame with prob0..probN columns or an (n, k)
    ndarray; returns the same type."""
    import pandas as pd

    if isinstance(probs, pd.DataFrame):
        arr = probs.to_numpy(dtype=np.float64, copy=True)
        out = _poisson(arr)
        return pd.DataFrame(out, columns=probs.columns, index=probs.index)
    return _poisson(np.array(probs, dtype=np.float64, copy=True))


def _poisson(arr: np.ndarray) -> np.ndarray:
    lam = -np.log(arr[:, 0])
    denom = 1.0 - arr[:, 0]
    scale = np.where(denom > 0, lam / np.where(denom > 0, denom, 1.0), 0.0)
    out = arr.copy()
    out[:, 1:] = arr[:, 1:] * scale[:, None]
    out[:, 0] = 1.0 - lam
    return out
