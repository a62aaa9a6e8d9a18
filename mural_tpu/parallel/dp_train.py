"""Data-parallel training over a device mesh.

An *extension* over the reference (which trains single-device,
SURVEY.md 2.3): the same jitted train step runs with the batch sharded
over the ``data`` mesh axis and the TrainState replicated; XLA inserts
the gradient all-reduce (psum) over ICI automatically from the sharding
annotations -- the idiomatic pjit recipe, no hand-written collectives.
"""

from __future__ import annotations

from functools import partial

import jax

from mural_tpu.parallel.mesh import batch_sharding, replicated
from mural_tpu.train.steps import make_train_step


def make_dp_train_step(model, mesh):
    """Returns (train_step, place_state, place_batch)."""
    rep = replicated(mesh)
    data_s = batch_sharding(mesh)

    base_step = make_train_step(model, donate=True)

    def place_state(state):
        return jax.device_put(state, rep)

    def place_batch(db):
        return db  # prefetch(..., sharding=data_s) already placed it

    return base_step, place_state, data_s
