"""Checkpoint triple: ``model`` + ``model.config.pkl`` + ``model.fdiri_cal.pkl``.

Same on-disk layout as the reference (training.py:570-578) so downstream
tooling (get_best_model, transfer, predict) finds the same files:

- ``model``              -- msgpack-serialised {params, batch_stats}
                            (flax.serialization), instead of a torch
                            state_dict.  Torch state_dicts from the
                            shipped reference models are importable via
                            :mod:`mural_tpu.utils.torch_import`.
- ``model.config.pkl``   -- pickled config dict; the authoritative
                            architecture record (rehydrated by transfer
                            and predict, run_predict.py:60-94).
- ``model.fdiri_cal.pkl``-- pickled FullDirichlet calibrator.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

from flax import serialization


def save_checkpoint(save_path: str, params, batch_stats, config: Dict,
                    calibrator=None) -> None:
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    payload = {"params": params, "batch_stats": batch_stats}
    with open(save_path, "wb") as fh:
        fh.write(serialization.to_bytes(payload))
    with open(save_path + ".config.pkl", "wb") as fh:
        pickle.dump(config, fh)
    if calibrator is not None:
        with open(save_path + ".fdiri_cal.pkl", "wb") as fh:
            pickle.dump(calibrator, fh)


def load_checkpoint(model_path: str, template: Dict) -> Dict:
    """Restore {params, batch_stats} into the shape of ``template``.

    Transparently falls back to the torch state_dict importer when the
    file is a torch zip archive (the shipped reference checkpoints).
    """
    with open(model_path, "rb") as fh:
        blob = fh.read()
    if blob[:2] == b"PK":           # torch zip-format state_dict
        from mural_tpu.utils.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(model_path, template)
    return serialization.from_bytes(template, blob)


def load_config(config_path: str) -> Dict:
    """Load a checkpoint config pickle, normalising pre-1.2 key names
    used by some shipped reference checkpoints (``central_radius`` ->
    ``segment_center``, ``batch_segment`` -> ``sampled_segments``)."""
    with open(config_path, "rb") as fh:
        config = pickle.load(fh)
    if "segment_center" not in config and "central_radius" in config:
        config["segment_center"] = config["central_radius"]
    if "sampled_segments" not in config and "batch_segment" in config:
        config["sampled_segments"] = config["batch_segment"]
    # the oldest shipped zoo checkpoints (e.g. models/Drosophila_
    # melanogaster/SNV/*) predate segment-based sampling and carry
    # neither key; the reference hard-exits there unless the user
    # passes --segment_center (run_train_TL_raytune.py:44-50,163-164).
    # Default to the train CLI default instead (commands/train.py:105)
    # so every published checkpoint works out of the box.
    config.setdefault("segment_center", 300000)
    return config


_DIRICHLETCAL_MAP = {
    ("dirichletcal.calib.fulldirichlet", "FullDirichletCalibrator"):
        ("mural_tpu.calibrate.dirichlet", "FullDirichletCalibrator"),
    ("dirichletcal.calib.tempscaling", "TemperatureScaling"):
        ("mural_tpu.calibrate.dirichlet", "TemperatureScaling"),
    ("dirichletcal.calib.vectorscaling", "VectorScaling"):
        ("mural_tpu.calibrate.dirichlet", "VectorScaling"),
    ("dirichletcal.calib.multinomial", "MultinomialRegression"):
        ("mural_tpu.calibrate.multinomial", "MultinomialRegression"),
}


class _CalibratorUnpickler(pickle.Unpickler):
    """Loads calibrator pickles written by the reference's vendored
    ``dirichletcal`` package by remapping its classes onto ours (the
    attribute layouts are compatible: ``calibrator_`` holding
    ``weights_``/``classes``)."""

    def find_class(self, module, name):
        key = (module, name)
        if key in _DIRICHLETCAL_MAP:
            module, name = _DIRICHLETCAL_MAP[key]
        if name == "_reconstruct_array" and module.startswith("jax"):
            # old-jax pickled DeviceArrays (their aval state no longer
            # unpickles); rebuild as plain numpy, which is all the
            # calibrator math needs
            return _rebuild_old_jax_array
        import importlib
        return getattr(importlib.import_module(module), name)


def _rebuild_old_jax_array(fun, args, arr_state, aval_state):
    import numpy as np
    value = fun(*args)
    value.__setstate__(arr_state)
    return np.asarray(value)


def load_calibrator(path: str):
    with open(path, "rb") as fh:
        return _CalibratorUnpickler(fh).load()
