"""Jitted train/eval steps.

One fused XLA program per step: device-side one-hot of the uint8 distal
codes, forward, masked CE-sum loss (the reference's
``CrossEntropyLoss(reduction='sum')``, training.py:327), gradient,
global-norm clip, optimizer update with the in-graph scheduled LR.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from mural_tpu.models.layers import one_hot_from_codes
from mural_tpu.train.state import TrainState


def masked_ce_sum(logits, y, mask):
    """sum over valid rows of -(log_softmax(logits)[y]).

    Model outputs are log-probabilities; torch CrossEntropyLoss treats
    them as logits and re-normalises -- replicated exactly.
    """
    # identity for f32; the bf16 path reduces in full precision; an f64
    # trace (the bench's double-precision torch-parity run) stays f64
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    logz = jax.nn.logsumexp(logits, axis=1)
    picked = jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]
    return jnp.sum((logz - picked) * mask)


def _forward(model, params, batch_stats, cat, cont, distal_codes, train,
             dropout_rng=None, distal_tracks=None, dtype=jnp.float32,
             fused_stem: bool = False):
    """``dtype``: activation dtype.  bfloat16 selects the mixed-precision
    path (params cast at use, BatchNorm statistics stay f32 -- see
    TorchBatchNorm); f32 is the torch-parity default.

    ``fused_stem``: pass the raw codes to the model so each distal
    tower's first BN+conv+pool runs as the fused table kernel
    (models/layers.FusedStemConvPool); requires no distal track
    channels."""
    if dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        if cont is not None:
            cont = cont.astype(dtype)
    if fused_stem and distal_tracks is None:
        distal = distal_codes          # model dispatches on ndim == 2
    else:
        distal = one_hot_from_codes(distal_codes, dtype)
    if distal_tracks is not None:
        # per-base track values appended as extra distal channels
        # (in_channels = 4**distal_order + n_cont, the working version
        # of the reference's training.py:258-260 promise)
        distal = jnp.concatenate(
            [distal, distal_tracks.astype(distal.dtype)], axis=-1)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = model.apply(variables, cat, cont, distal, True,
                               rngs={"dropout": dropout_rng},
                               mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return model.apply(variables, cat, cont, distal, False), batch_stats


def make_train_step(model, donate: bool = True,
                    matmul_precision: Optional[str] = None):
    """``matmul_precision``: None keeps the platform default (f32 convs
    run as multi-pass bf16 on TPU); 'bfloat16' selects single-pass bf16
    MXU matmuls/convs -- faster, loss trajectory within tolerance of f32
    (tests/test_bf16.py)."""
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, y, cat, cont, distal_codes, mask,
                   base_rng, distal_tracks=None):
        lr = state.lr()
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            import contextlib
            ctx = (jax.default_matmul_precision(matmul_precision)
                   if matmul_precision else contextlib.nullcontext())
            with ctx:
                logits, new_stats = _forward(model, params,
                                             state.batch_stats,
                                             cat, cont, distal_codes,
                                             True, rng, distal_tracks)
            loss = masked_ce_sum(logits, y, mask)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        updates = jax.tree.map(lambda u, m: -lr * u * m, updates,
                               state.trainable_mask)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, loss, lr

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch_stats, y, cat, cont, distal_codes, mask,
                  distal_tracks=None):
        logits, _ = _forward(model, params, batch_stats, cat, cont,
                             distal_codes, False,
                             distal_tracks=distal_tracks)
        loss = masked_ce_sum(logits, y, mask)
        return logits, loss

    return eval_step
