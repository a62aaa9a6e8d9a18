"""Mesh-sharded batched inference.

Genome-wide prediction is embarrassingly parallel over sites
(SURVEY.md 2.3: the reference's answer is "split the BED and run many
processes", commands/predict.py docs).  Here a single jitted eval step
runs with the batch sharded over a 1-D device mesh: params replicate,
activations shard on the batch axis, no collectives are needed until the
host gathers the logits.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mural_tpu.data.batcher import segment_pool_batches
from mural_tpu.data.prefetch import prefetch
from mural_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from mural_tpu.train.steps import make_eval_step


def sharded_predict(model, params, batch_stats, ds, batch_size: int,
                    n_devices: int,
                    eval_step=None) -> Tuple[np.ndarray, float]:
    """Run prediction over ``ds`` with batches sharded over a mesh.

    ``batch_size`` is rounded up to a multiple of ``n_devices`` so every
    shard is equal; padding rows are masked out of the loss and dropped
    from the outputs.  ``eval_step`` overrides the standard jitted step
    (e.g. the BN-folded fused forward); it must have make_eval_step's
    signature.
    """
    mesh = make_mesh(n_devices)
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)

    per = -(-batch_size // n_devices)
    eff_batch = per * n_devices

    if eval_step is None:
        eval_step = make_eval_step(model)

    params = jax.device_put(params, rep)
    batch_stats = jax.device_put(batch_stats, rep)

    parts = []
    n_valids = []
    loss_dev = jnp.zeros((), jnp.float32)
    batches = segment_pool_batches(ds, 1, eff_batch, shuffle=False,
                                   pad_final=True)
    for db in prefetch(batches, size=2, sharding=data_s):
        logits, loss = eval_step(params, batch_stats, db.y, db.cat,
                                 db.cont, db.distal, db.mask,
                                 db.distal_tracks)
        parts.append(logits)
        n_valids.append(db.n_valid)
        loss_dev = loss_dev + loss
    total_loss = float(loss_dev)
    if parts:
        logits = np.concatenate(
            [np.asarray(lg)[:n] for lg, n in zip(parts, n_valids)])
    else:
        # keep the (0, n_class) shape the single-device branch returns
        # (pipeline.py builds a DataFrame with n_class prob columns)
        n_class = getattr(model, "n_class", 0)
        logits = np.zeros((0, n_class))
    return logits, total_loss
