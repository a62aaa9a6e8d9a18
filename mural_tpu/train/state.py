"""Train state: params + batch stats + optimizer state + LR bookkeeping.

A functional re-design of the reference's torch training loop state
(model, optimizer, scheduler; MuRaL/training.py:271-385).  The schedule is
evaluated in-graph from ``step``/``epoch`` so the whole train step jits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mural_tpu.train.optim import LRSchedule, build_optimizer


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray                       # int32 optimizer-step counter
    epoch: jnp.ndarray                      # int32 epoch counter
    rop_lr: jnp.ndarray                     # current LR for the ROP schedule
    trainable_mask: Any                     # pytree of 0/1 (transfer freeze)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    schedule: LRSchedule = struct.field(pytree_node=False)

    def lr(self):
        return self.schedule.lr_at(self.step, self.epoch, self.rop_lr)

    def next_epoch(self) -> "TrainState":
        return self.replace(epoch=self.epoch + 1)


def create_train_state(model, variables, optim_name: str,
                       weight_decay: float, schedule: LRSchedule,
                       grad_clip: float = 10.0,
                       trainable_mask=None) -> TrainState:
    """grad_clip mirrors ``clip_grad_norm_(model.parameters(), 10)``
    (training.py:434), applied before the optimizer update.
    ``trainable_mask``: optional pytree of 0/1 floats matching params;
    frozen leaves get zero updates (the transfer-learning freeze,
    training.py:301-314)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        build_optimizer(optim_name, weight_decay),
    )
    params = variables["params"]
    if trainable_mask is None:
        trainable_mask = jax.tree.map(
            lambda p: jnp.ones((), jnp.float32), params)
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        rop_lr=jnp.asarray(schedule.base_lr, jnp.float32),
        trainable_mask=trainable_mask,
        tx=tx,
        schedule=schedule,
    )
