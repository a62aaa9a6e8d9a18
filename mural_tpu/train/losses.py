"""Alternative losses (ref MuRaL/evaluation/evaluation.py:367-487).

The reference defines FocalLoss / CBLoss / CB_loss but never wires them
into training (its loop hard-codes CrossEntropyLoss(reduction='sum'),
training.py:327); they are ported here as jnp functions for completeness
and parity-tested against torch in tests/test_losses.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def focal_ce_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  gamma: float = 0.0,
                  size_average: bool = False) -> jnp.ndarray:
    """Multi-class focal loss on softmax log-probs
    (ref FocalLoss.forward, evaluation.py:373-387):
    loss_i = -(1 - p_t)^gamma * log p_t, summed (or averaged)."""
    logpt = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logpt, target[:, None], axis=1)[:, 0]
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * logpt
    return loss.mean() if size_average else loss.sum()


def _binary_ce_with_logits(logits, labels, weight=None):
    """Elementwise sigmoid BCE (torch binary_cross_entropy_with_logits,
    reduction='mean' over all elements when weighted)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(labels * log_p + (1.0 - labels) * log_not_p)
    if weight is not None:
        loss = loss * weight
    return loss


def sigmoid_focal_loss(labels_one_hot: jnp.ndarray, logits: jnp.ndarray,
                       alpha: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Per-class sigmoid focal loss (ref focal_loss, evaluation.py:
    389-417): modulator * BCE, alpha-weighted, normalised by the number
    of positive labels."""
    bc = _binary_ce_with_logits(logits, labels_one_hot)
    if gamma == 0.0:
        modulator = 1.0
    else:
        modulator = jnp.exp(-gamma * labels_one_hot * logits
                            - gamma * jnp.log1p(jnp.exp(-logits)))
    weighted = alpha * modulator * bc
    return weighted.sum() / labels_one_hot.sum()


def class_balanced_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        samples_per_cls: Sequence[int],
                        n_class: int, loss_type: str = "sigmoid",
                        beta: float = 0.9999,
                        gamma: float = 1.0) -> jnp.ndarray:
    """Class-balanced loss (ref CBLoss.forward, evaluation.py:427-449):
    weights = (1-beta)/(1-beta^n_c), normalised to sum to n_class, and
    broadcast per-sample via the label one-hot."""
    effective_num = 1.0 - np.power(beta, np.asarray(samples_per_cls,
                                                    np.float64))
    weights = (1.0 - beta) / effective_num
    weights = weights / weights.sum() * n_class

    one_hot = jax.nn.one_hot(labels, n_class, dtype=logits.dtype)
    w = jnp.asarray(weights, logits.dtype)[None, :] * one_hot
    w = w.sum(axis=1, keepdims=True)
    w = jnp.broadcast_to(w, one_hot.shape)

    if loss_type == "focal":
        return sigmoid_focal_loss(one_hot, logits, w, gamma)
    if loss_type == "sigmoid":
        return _binary_ce_with_logits(logits, one_hot, w).mean()
    if loss_type == "softmax":
        pred = jax.nn.softmax(logits, axis=1)
        eps = 1e-12
        bce = -(one_hot * jnp.log(jnp.clip(pred, eps))
                + (1 - one_hot) * jnp.log(jnp.clip(1 - pred, eps)))
        return (w * bce).mean()
    raise ValueError(f"unknown loss_type {loss_type!r}")
