"""Flat-packed train state: the whole optimizer loop on a few buffers.

The model family is many-small-parameters (SNVNet2: ~480 leaves, ~1 MB
total).  Dispatching a jitted step whose output is a ~480-leaf pytree
costs ~15 us *per leaf* in host/runtime bookkeeping (measured: an
identity program over the TrainState pytree takes ~7 ms on a remote TPU
transport -- more than the whole fused train step's compute).  The fix
is structural, not a kernel: keep parameters, batch statistics, the
trainable-mask and the Adam moments each as ONE flat f32 buffer, and
unflatten/reflatten *inside* the jitted program where slicing is free
(XLA constant-folds the static offsets and fuses the reshapes).

The packed step is numerically equivalent to the per-leaf step: every
optimizer transform used here (global-norm clip, L2/decoupled weight
decay, Adam/AMSGrad moments, momentum trace) is elementwise or a global
reduction, so operating on the concatenation of the leaves produces the
same updates (up to f32 reduction order inside the global norm) --
asserted by tests/test_packed.py.

The reference has no analogue (torch mutates parameters in place, so it
never pays a per-leaf dispatch); this is a TPU/XLA-runtime concern.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mural_tpu.train.optim import LRSchedule
from mural_tpu.train.state import TrainState
from mural_tpu.train.steps import _forward, masked_ce_sum


@dataclasses.dataclass(frozen=True)
class TreeSpec:
    """Static description of a flattened f32 pytree (hashable, so it can
    ride on a ``struct.field(pytree_node=False)``)."""
    treedef: Any
    shapes: tuple
    offsets: tuple
    total: int

    @staticmethod
    def of(tree: Any) -> "TreeSpec":
        leaves, treedef = jax.tree.flatten(tree)
        for l in leaves:
            if np.dtype(l.dtype) != np.float32:
                raise TypeError(
                    f"packed state requires float32 leaves, got {l.dtype} "
                    f"for shape {l.shape}")
        shapes = tuple(tuple(l.shape) for l in leaves)
        sizes = [int(np.prod(s)) if s else 1 for s in shapes]
        offsets = tuple(int(o) for o in np.cumsum([0] + sizes))
        return TreeSpec(treedef, shapes, offsets, offsets[-1])


def pack_tree(tree: Any, spec: TreeSpec) -> jnp.ndarray:
    """Pytree -> (total,) f32 vector.  Traceable.

    The shape check guards the silent-misalignment hazard: a tree whose
    structure drifted from the spec (e.g. a flax upgrade changing the
    batch_stats collection) would otherwise concatenate into offsets
    that ``unpack_tree`` slices wrongly, corrupting values undetected.
    """
    leaves = jax.tree.leaves(tree)
    if tuple(tuple(l.shape) for l in leaves) != spec.shapes:
        raise ValueError(
            f"tree does not match its pack spec: {len(leaves)} leaves "
            f"{[tuple(l.shape) for l in leaves][:5]}... vs spec "
            f"{len(spec.shapes)} leaves {list(spec.shapes)[:5]}...")
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate([jnp.ravel(l) for l in leaves])


def unpack_tree(flat: jnp.ndarray, spec: TreeSpec) -> Any:
    """(total,) vector -> pytree.  Traceable; static slices fold away."""
    leaves = [flat[spec.offsets[i]:spec.offsets[i + 1]].reshape(s)
              for i, s in enumerate(spec.shapes)]
    return spec.treedef.unflatten(leaves)


def unpack_tree_np(flat: np.ndarray, spec: TreeSpec) -> Any:
    """Host-side unpack of an already-fetched flat vector."""
    flat = np.asarray(flat)
    leaves = [flat[spec.offsets[i]:spec.offsets[i + 1]].reshape(s)
              for i, s in enumerate(spec.shapes)]
    return spec.treedef.unflatten(leaves)


class PackedTrainState(struct.PyTreeNode):
    flat_params: jnp.ndarray                # (P,) f32
    flat_stats: jnp.ndarray                 # (S,) f32 batch stats
    flat_mask: jnp.ndarray                  # (P,) f32 transfer freeze
    opt_state: Any                          # optax state over (P,)
    step: jnp.ndarray
    epoch: jnp.ndarray
    rop_lr: jnp.ndarray
    tx: Any = struct.field(pytree_node=False)
    schedule: LRSchedule = struct.field(pytree_node=False)
    p_spec: TreeSpec = struct.field(pytree_node=False)
    s_spec: TreeSpec = struct.field(pytree_node=False)

    def lr(self):
        return self.schedule.lr_at(self.step, self.epoch, self.rop_lr)

    def next_epoch(self) -> "PackedTrainState":
        return self.replace(epoch=self.epoch + 1)

    # -- host-side views (one transfer per buffer) -----------------------
    def params_host(self) -> Any:
        return unpack_tree_np(np.asarray(self.flat_params), self.p_spec)

    def batch_stats_host(self) -> Any:
        return unpack_tree_np(np.asarray(self.flat_stats), self.s_spec)


def pack_state(state: TrainState) -> PackedTrainState:
    """TrainState (fresh from ``create_train_state``) -> packed form.

    The optimizer state is re-initialised over the flat vector; call this
    before training starts (the packed moments then evolve identically to
    the per-leaf ones)."""
    p_spec = TreeSpec.of(state.params)
    s_spec = TreeSpec.of(state.batch_stats)
    pack = jax.jit(lambda t: pack_tree(t, p_spec))
    flat_params = pack(state.params)
    # mask leaves are () scalars (or full arrays); broadcast to leaf shape
    mask_full = jax.tree.map(
        lambda m, p: jnp.broadcast_to(jnp.asarray(m, jnp.float32),
                                      p.shape),
        state.trainable_mask, state.params)
    flat_mask = jax.jit(lambda t: pack_tree(t, p_spec))(mask_full)
    flat_stats = (jax.jit(lambda t: pack_tree(t, s_spec))(state.batch_stats)
                  if s_spec.total else jnp.zeros((0,), jnp.float32))
    return PackedTrainState(
        flat_params=flat_params,
        flat_stats=flat_stats,
        flat_mask=flat_mask,
        opt_state=state.tx.init(flat_params),
        step=state.step,
        epoch=state.epoch,
        rop_lr=state.rop_lr,
        tx=state.tx,
        schedule=state.schedule,
        p_spec=p_spec,
        s_spec=s_spec,
    )


def make_packed_train_step(model, pstate: PackedTrainState,
                           donate: bool = True,
                           bf16: bool = False,
                           fused_stem: bool = False):
    """Same math as ``steps.make_train_step`` on the packed state.
    Output pytree is ~10 leaves instead of ~480.

    ``bf16``: bfloat16 activations/compute (params cast at use, f32
    optimizer + BatchNorm statistics + loss reduction) -- halves the
    step's HBM working set, measured 1.65x on the SNV train step.
    ``fused_stem``: codes go to the model raw and each distal tower's
    first BN+conv+pool runs as the fused table kernel (steps._forward)."""
    p_spec, s_spec, tx = pstate.p_spec, pstate.s_spec, pstate.tx
    act_dtype = jnp.bfloat16 if bf16 else jnp.float32

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(ps: PackedTrainState, y, cat, cont, distal_codes,
                   mask, base_rng, distal_tracks=None):
        lr = ps.lr()
        rng = jax.random.fold_in(base_rng, ps.step)

        def loss_fn(flat_p):
            params = unpack_tree(flat_p, p_spec)
            stats = unpack_tree(ps.flat_stats, s_spec)
            logits, new_stats = _forward(model, params, stats, cat,
                                         cont, distal_codes, True,
                                         rng, distal_tracks,
                                         dtype=act_dtype,
                                         fused_stem=fused_stem)
            loss = masked_ce_sum(logits, y, mask)
            return loss, pack_tree(new_stats, s_spec)

        (loss, new_flat_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ps.flat_params)
        updates, opt_state = tx.update(grads, ps.opt_state,
                                       ps.flat_params)
        flat_params = ps.flat_params - lr * updates * ps.flat_mask
        new_ps = ps.replace(flat_params=flat_params,
                            flat_stats=new_flat_stats,
                            opt_state=opt_state, step=ps.step + 1)
        return new_ps, loss, lr

    return train_step


def make_packed_train_step_scan(model, pstate: PackedTrainState,
                                bf16: bool = False,
                                fused_stem: bool = False):
    """K train steps per dispatch via ``lax.scan`` over stacked batches.

    Amortises the fixed per-dispatch wall cost (~0.5 ms through a remote
    TPU transport) over K steps; the math per microbatch is identical to
    :func:`make_packed_train_step` (same per-step ``fold_in`` RNG
    stream, same optimizer update), so a K-dispatch epoch equals a
    single-step epoch batch for batch (tests/test_packed.py).

    Batch arrays are stacked on a leading axis: ``ys (K, B)``,
    ``cats (K, B, n_cat)`` etc.  Returns ``(new_state, losses (K,), lr)``
    with one loss per microbatch.
    """
    p_spec, s_spec, tx = pstate.p_spec, pstate.s_spec, pstate.tx
    act_dtype = jnp.bfloat16 if bf16 else jnp.float32

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_scan(ps: PackedTrainState, ys, cats, conts,
                        distal_codess, masks, base_rng,
                        distal_trackss=None):
        def body(ps, xs):
            y, cat, cont, codes, mask, tracks = xs
            lr = ps.lr()
            rng = jax.random.fold_in(base_rng, ps.step)

            def loss_fn(flat_p):
                params = unpack_tree(flat_p, p_spec)
                stats = unpack_tree(ps.flat_stats, s_spec)
                logits, new_stats = _forward(model, params, stats,
                                             cat, cont, codes, True,
                                             rng, tracks,
                                             dtype=act_dtype,
                                             fused_stem=fused_stem)
                loss = masked_ce_sum(logits, y, mask)
                return loss, pack_tree(new_stats, s_spec)

            (loss, new_flat_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ps.flat_params)
            updates, opt_state = tx.update(grads, ps.opt_state,
                                           ps.flat_params)
            flat_params = ps.flat_params - lr * updates * ps.flat_mask
            return ps.replace(flat_params=flat_params,
                              flat_stats=new_flat_stats,
                              opt_state=opt_state,
                              step=ps.step + 1), (loss, lr)

        ps, (losses, lrs) = jax.lax.scan(
            body, ps, (ys, cats, conts, distal_codess, masks,
                       distal_trackss))
        return ps, losses, lrs[-1]

    return train_step_scan


def pack_variables(params: Any, batch_stats: Any):
    """Inference-side packing: (params, batch_stats) trees ->
    (flat_params, flat_stats, p_spec, s_spec).  Passing two flat buffers
    per jitted call instead of ~480 leaves removes the per-leaf dispatch
    cost from every predict batch (measured 2.5x on the SNV eval
    forward)."""
    p_spec = TreeSpec.of(params)
    s_spec = TreeSpec.of(batch_stats)
    flat_p = jax.jit(lambda t: pack_tree(t, p_spec))(params)
    flat_s = (jax.jit(lambda t: pack_tree(t, s_spec))(batch_stats)
              if s_spec.total else jnp.zeros((0,), jnp.float32))
    return flat_p, flat_s, p_spec, s_spec


def make_packed_eval_step(model, specs, fused_stem: bool = False):
    """Eval forward taking the flat buffers directly (2 input leaves).

    ``specs``: anything with ``.p_spec``/``.s_spec`` (a
    ``PackedTrainState``) or a ``(p_spec, s_spec)`` tuple."""
    if isinstance(specs, tuple):
        p_spec, s_spec = specs
    else:
        p_spec, s_spec = specs.p_spec, specs.s_spec

    @jax.jit
    def eval_step(flat_p, flat_s, y, cat, cont, distal_codes, mask,
                  distal_tracks=None):
        params = unpack_tree(flat_p, p_spec)
        stats = unpack_tree(flat_s, s_spec)
        logits, _ = _forward(model, params, stats, cat, cont,
                             distal_codes, False,
                             distal_tracks=distal_tracks,
                             fused_stem=fused_stem)
        return logits, masked_ce_sum(logits, y, mask)

    return eval_step
