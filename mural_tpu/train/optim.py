"""Optimizers and learning-rate schedules with torch semantics.

Reference behaviours re-implemented (MuRaL/training.py):

- optimizers (:347-361): ``Adam`` (L2 folded into the gradient, torch
  style), ``AdamW``/``AdamW2`` (decoupled decay + amsgrad), ``SGD``
  (momentum 0.98, nesterov).
- ``weight_decay_auto`` (:338-344):
  ``wd = 1 - wda ** (batch_size / (epochs * train_size))``.
- LR schedules (:365-373) are *stateful per optimizer step* and include a
  restart rule (lr < min_lr -> restart_lr, :444-451); they are evaluated
  in-graph from the step counter so the train step stays jittable:

  * ``StepLR``:  lr decays by ``gamma`` every ``(5000*128)//batch_size``
    steps, restarting at ``restart_lr`` whenever it would drop below
    ``min_lr``.
  * ``StepLR2``: per-epoch geometric anneal restart_lr -> min_lr over one
    epoch (gamma per step = (min_lr/restart_lr)**(1/steps_per_epoch)),
    with the LR reset to ``restart_lr`` at each epoch start (:396-398).
  * ``ROP``: ReduceLROnPlateau(factor 0.2, patience 1, threshold 1e-4,
    min_lr 1e-7), stepped per epoch on the host (:371-373,553-554).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import optax


def auto_weight_decay(weight_decay_auto: Optional[float], batch_size: int,
                      epochs: int, train_size: int,
                      weight_decay: float) -> float:
    """training.py:338-344."""
    if weight_decay_auto is not None and weight_decay_auto > 0:
        if weight_decay_auto >= 1:
            raise ValueError(
                "Please set a value smaller than 1 for --weight_decay_auto.")
        return 1 - weight_decay_auto ** (batch_size / (epochs * train_size))
    return weight_decay


@dataclasses.dataclass(frozen=True)
class LRSchedule:
    """In-graph per-step LR computation mirroring torch StepLR chains."""
    kind: str                 # 'StepLR' | 'StepLR2' | 'ROP' | 'constant'
    base_lr: float
    gamma: float = 0.9
    step_size: int = 1
    restart_lr: float = 1e-4
    min_lr: float = 1e-6
    steps_per_epoch: int = 1

    @classmethod
    def build(cls, name: str, learning_rate: float, LR_gamma: float,
              batch_size: int, train_size: int, restart_lr: float,
              min_lr: float) -> "LRSchedule":
        steps_per_epoch = max(train_size // batch_size, 1)
        if name == "StepLR":
            return cls("StepLR", learning_rate, LR_gamma,
                       max((5000 * 128) // batch_size, 1), restart_lr,
                       min_lr, steps_per_epoch)
        if name == "StepLR2":
            gamma = (min_lr / restart_lr) ** (1.0 / steps_per_epoch)
            return cls("StepLR2", learning_rate, gamma, 1, restart_lr,
                       min_lr, steps_per_epoch)
        if name == "ROP":
            return cls("ROP", learning_rate, 0.2, 1, restart_lr, min_lr,
                       steps_per_epoch)
        if name == "constant":
            return cls("constant", learning_rate, 1.0, 1, restart_lr,
                       min_lr, steps_per_epoch)
        raise ValueError(
            f"unsupported lr_scheduler {name!r}; choose StepLR, StepLR2 "
            "or ROP")

    def _first_below(self, start: float) -> int:
        """Smallest j >= 0 with start * gamma**j < min_lr."""
        import math
        if self.gamma >= 1.0 or start < self.min_lr:
            return 0 if start < self.min_lr else 2 ** 30
        x = math.log(self.min_lr / start) / math.log(self.gamma)
        return max(int(math.floor(x)) + 1, 0)

    def _phase_lr(self, decays: jnp.ndarray, start: float) -> jnp.ndarray:
        """LR after `decays` gamma-steps from `start`, with the
        restart-below-min rule (training.py:444-451): whenever the decayed
        LR would fall below min_lr it is reset to restart_lr."""
        j0 = self._first_below(start)
        jr = max(self._first_below(self.restart_lr), 1)
        in_first = decays < j0
        k = jnp.maximum(decays - j0, 0) % jr
        lr_first = start * jnp.power(self.gamma,
                                     jnp.minimum(decays, j0).astype(
                                         jnp.float32))
        lr_restarted = self.restart_lr * jnp.power(
            self.gamma, k.astype(jnp.float32))
        return jnp.where(in_first, lr_first, lr_restarted)

    def lr_at(self, step: jnp.ndarray, epoch: jnp.ndarray,
              rop_lr: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Learning rate used by optimizer step `step` (0-based, global).

        torch calls scheduler.step() after each optimizer step, so step k
        sees the LR after k//step_size prior decays.  StepLR2 additionally
        resets the LR to restart_lr at the start of every epoch > 0
        (training.py:396-398).
        """
        if self.kind == "ROP":
            return rop_lr
        if self.kind == "constant":
            return jnp.asarray(self.base_lr, jnp.float32)

        if self.kind == "StepLR":
            decays = step // self.step_size
            lr = self._phase_lr(decays, self.base_lr)
        else:  # StepLR2
            decays = step - epoch * self.steps_per_epoch
            lr = jnp.where(epoch == 0,
                           self._phase_lr(decays, self.base_lr),
                           self._phase_lr(decays, self.restart_lr))
        return lr.astype(jnp.float32)


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity with the
    reference's settings (training.py:372): mode='min', factor=0.2,
    patience=1, threshold=1e-4 (rel mode), min_lr=1e-7; stepped once per
    epoch with the validation loss (:553-554).

    torch semantics replicated exactly: an epoch improves only if
    ``metric < best * (1 - threshold)``; the bad-epoch counter resets
    after every LR reduction, so patience=1 reduces at most every two
    non-improving epochs."""

    def __init__(self, init_lr: float, factor: float = 0.2,
                 patience: int = 1, threshold: float = 1e-4,
                 min_lr: float = 1e-7):
        self.lr = float(init_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """AMSGrad with torch's exact formulation.

    torch maxes the *raw* second moment (``max_exp_avg_sq = max(.., nu)``)
    and bias-corrects at the current step, whereas optax's
    ``scale_by_amsgrad`` maxes the bias-corrected moment -- the two
    diverge over time.  This matches ``torch.optim.AdamW(amsgrad=True)``
    step-for-step (verified in tests/test_train.py).
    """
    import jax

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return dict(count=jnp.zeros((), jnp.int32), mu=zeros,
                    nu=jax.tree.map(jnp.zeros_like, params),
                    nu_max=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            mu, nu_max)
        return out, dict(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(name: str, weight_decay: float) -> optax.GradientTransformation:
    """Return a transformation expecting a separately-scaled LR.

    The returned chain produces *parameter updates for lr=1*; the train
    step multiplies by the scheduled LR (optax.scale) via inject.
    """
    if name == "Adam":
        # torch Adam: L2 added to the gradient BEFORE the moment update
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if name in ("AdamW", "AdamW2"):
        # torch AdamW(amsgrad=True): decoupled decay
        return optax.chain(
            scale_by_amsgrad_torch(),
            optax.add_decayed_weights(weight_decay),
        )
    if name == "SGD":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=0.98, nesterov=True),
        )
    raise ValueError(f"unsupported optimization method {name}")
