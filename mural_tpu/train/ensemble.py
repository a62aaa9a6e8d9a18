"""Vmapped trial ensembles: K hyperparameter trials as ONE program.

The reference packs ~6 trials onto one GPU with Ray fractional
resources (``gpu_per_trial=0.15``, run_train_raytune.py:306,
commands/train.py:230-233) -- six CUDA contexts time-slicing one
device.  The TPU-native equivalent (SURVEY.md 2.3) stacks T
same-architecture trials on a leading axis and ``jax.vmap``s the whole
device-resident epoch (train/resident.py), so ONE ``lax.scan`` dispatch
trains all T members:

- the uint8 code arena, per-site arrays and validation rows are shared
  device buffers (in_axes=None) -- T trials cost ONE dataset encode and
  ONE arena upload instead of T;
- per-trial quantities ride as (T,)-leading arrays: parameters,
  optimizer moments, BatchNorm statistics, RNG keys, epoch row
  permutations, and -- via :class:`ScheduleArrays` -- the learning-rate
  /weight-decay hyperparameters themselves, so members sampled with
  different ``learning_rate``/``weight_decay``/``LR_gamma`` share one
  compiled program;
- a ``live`` mask freezes members the scheduler stopped (ASHA) without
  recompiling: params, optimizer state and BN stats hold, the compute
  proceeds (an ensemble trades per-member early-stop savings for
  T-fold step-rate multiplication).

Measured bound (v5e, B=128, T-sweep with value-fetch fences — see
docs/usage.md): the resident step is HBM-bandwidth-bound, so member
compute does not stack for free.  Aggregate speedup over a serial
trial is ~1.4x f32 / ~1.7x bf16 at T=8 (bf16 T=8 reaches 1.16M w/s —
the same bandwidth ceiling a single B=2048 trial gets); T=16
regresses.  The structural wins are ONE dataset encode + arena upload
+ compiled program for T trials; the throughput win is real but
bandwidth-bounded, not Tx.

Per-member math is identical to the single-trial packed path
(packed.make_packed_train_step / resident.make_resident_epoch_fn):
same clip-10 -> weight-decay -> Adam/AMSGrad/SGD update order as
``create_train_state``'s optax chain (state.py:47-50), same per-step
``fold_in`` RNG stream, same in-graph LR schedule -- asserted member-
for-member against serial trials in tests/test_ensemble.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mural_tpu.train.optim import LRSchedule
from mural_tpu.train.packed import TreeSpec, pack_tree, unpack_tree
from mural_tpu.train.resident import _gather_onehot
from mural_tpu.train.steps import masked_ce_sum

GRAD_CLIP = 10.0    # clip_grad_norm_(parameters, 10), training.py:434


class ScheduleArrays(struct.PyTreeNode):
    """Per-trial LR-schedule constants as traced arrays.

    ``LRSchedule`` bakes base_lr/gamma in as Python floats (hashable
    static state), which is right for one trial but blocks vmapping
    trials with different sampled values.  Here the floats become (T,)
    leaves and the two integer decay-phase boundaries the host-side
    ``_first_below`` computes are precomputed per member -- the traced
    ``lr_at`` below then reproduces ``LRSchedule.lr_at`` exactly
    (tests/test_ensemble.py::test_schedule_arrays_match_lr_schedule).
    """
    base_lr: jnp.ndarray        # (T,) f32
    gamma: jnp.ndarray          # (T,) f32
    restart_lr: jnp.ndarray     # (T,) f32
    j0_base: jnp.ndarray        # (T,) i32  first decay below min_lr from base
    j0_restart: jnp.ndarray     # (T,) i32  ... from restart_lr
    jr: jnp.ndarray             # (T,) i32  restart period (>=1)
    kind: str = struct.field(pytree_node=False)
    step_size: int = struct.field(pytree_node=False)
    steps_per_epoch: int = struct.field(pytree_node=False)

    @classmethod
    def from_schedules(cls, schedules: List[LRSchedule]) -> "ScheduleArrays":
        kinds = {s.kind for s in schedules}
        if len(kinds) != 1:
            raise ValueError(f"ensemble members mix LR schedules: {kinds}")
        sizes = {(s.step_size, s.steps_per_epoch) for s in schedules}
        if len(sizes) != 1:
            raise ValueError(
                f"ensemble members mix schedule step sizes: {sizes} "
                "(batch_size must match within a group)")
        s0 = schedules[0]
        return cls(
            base_lr=jnp.asarray([s.base_lr for s in schedules],
                                jnp.float32),
            gamma=jnp.asarray([s.gamma for s in schedules], jnp.float32),
            restart_lr=jnp.asarray([s.restart_lr for s in schedules],
                                   jnp.float32),
            j0_base=jnp.asarray(
                [min(s._first_below(s.base_lr), 2 ** 30)
                 for s in schedules], jnp.int32),
            j0_restart=jnp.asarray(
                [min(s._first_below(s.restart_lr), 2 ** 30)
                 for s in schedules], jnp.int32),
            jr=jnp.asarray(
                [max(min(s._first_below(s.restart_lr), 2 ** 30), 1)
                 for s in schedules], jnp.int32),
            kind=s0.kind,
            step_size=s0.step_size,
            steps_per_epoch=s0.steps_per_epoch,
        )

    def _phase_lr(self, decays, start, j0):
        """Traced twin of LRSchedule._phase_lr (optim.py:87-100)."""
        in_first = decays < j0
        k = jnp.maximum(decays - j0, 0) % self.jr
        lr_first = start * jnp.power(
            self.gamma, jnp.minimum(decays, j0).astype(jnp.float32))
        lr_restarted = self.restart_lr * jnp.power(
            self.gamma, k.astype(jnp.float32))
        return jnp.where(in_first, lr_first, lr_restarted)

    def lr_at(self, step, epoch, rop_lr):
        """Vectorised over members; also valid on scalar slices (inside
        vmap).  Mirrors LRSchedule.lr_at (optim.py:102-124)."""
        if self.kind == "ROP":
            return rop_lr
        if self.kind == "constant":
            return self.base_lr
        if self.kind == "StepLR":
            decays = step // self.step_size
            lr = self._phase_lr(decays, self.base_lr, self.j0_base)
        else:   # StepLR2
            decays = step - epoch * self.steps_per_epoch
            lr = jnp.where(epoch == 0,
                           self._phase_lr(decays, self.base_lr,
                                          self.j0_base),
                           self._phase_lr(decays, self.restart_lr,
                                          self.j0_restart))
        return lr.astype(jnp.float32)


def _opt_init(optim_name: str, flat_params: jnp.ndarray) -> dict:
    """Optimizer state over (T, P) stacked flat params; mirrors the
    optax chains of build_optimizer (optim.py:197-220)."""
    T = flat_params.shape[0]

    def zeros():
        # distinct buffers: donation rejects the same array in two
        # argument slots (`f(donate(a), donate(a))`)
        return jnp.zeros_like(flat_params)

    if optim_name == "Adam":
        return {"count": jnp.zeros((T,), jnp.int32),
                "mu": zeros(), "nu": zeros()}
    if optim_name in ("AdamW", "AdamW2"):
        return {"count": jnp.zeros((T,), jnp.int32),
                "mu": zeros(), "nu": zeros(), "nu_max": zeros()}
    if optim_name == "SGD":
        return {"trace": zeros()}
    raise ValueError(f"unsupported optimization method {optim_name}")


def _opt_update(optim_name: str, g, p, opt: dict, wd):
    """One member's update (shapes (P,), called under vmap).

    Exactly the optax chain of create_train_state (state.py:47-50):
    clip_by_global_norm(10) -> build_optimizer(optim, wd), with the
    member's weight decay as a traced scalar:

    - Adam:   u = scale_by_adam(clip(g) + wd*p)      (L2 in the gradient)
    - AdamW*: u = amsgrad_torch(clip(g)) + wd*p      (decoupled decay)
    - SGD:    u = trace_{.98,nesterov}(clip(g) + wd*p)
    """
    gn = jnp.sqrt(jnp.sum(g * g))
    g = g * (GRAD_CLIP / jnp.maximum(gn, GRAD_CLIP))
    b1, b2, eps = 0.9, 0.999, 1e-8
    if optim_name == "Adam":
        g = g + wd * p
        count = opt["count"] + 1
        mu = b1 * opt["mu"] + (1 - b1) * g
        nu = b2 * opt["nu"] + (1 - b2) * g * g
        c = count.astype(jnp.float32)
        u = (mu / (1 - b1 ** c)) / (jnp.sqrt(nu / (1 - b2 ** c)) + eps)
        return u, {"count": count, "mu": mu, "nu": nu}
    if optim_name in ("AdamW", "AdamW2"):
        # torch amsgrad maxes the RAW second moment (optim.py:161-194)
        count = opt["count"] + 1
        mu = b1 * opt["mu"] + (1 - b1) * g
        nu = b2 * opt["nu"] + (1 - b2) * g * g
        nu_max = jnp.maximum(opt["nu_max"], nu)
        c = count.astype(jnp.float32)
        u = ((mu / (1 - b1 ** c))
             / (jnp.sqrt(nu_max / (1 - b2 ** c)) + eps))
        u = u + wd * p
        return u, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}
    # SGD, momentum .98 nesterov (training.py:358-361)
    g = g + wd * p
    tr = 0.98 * opt["trace"] + g
    u = g + 0.98 * tr
    return u, {"trace": tr}


class EnsembleState(struct.PyTreeNode):
    """T stacked trials: every per-trial quantity leads with axis T."""
    flat_params: jnp.ndarray        # (T, P) f32
    flat_stats: jnp.ndarray         # (T, S) f32
    flat_mask: jnp.ndarray          # (T, P) f32 (transfer freeze; ones)
    opt: dict                       # optimizer arrays, (T, ...) each
    step: jnp.ndarray               # (T,) i32
    epoch: jnp.ndarray              # (T,) i32
    rop_lr: jnp.ndarray             # (T,) f32
    wd: jnp.ndarray                 # (T,) f32 per-member weight decay
    live: jnp.ndarray               # (T,) f32 1=running, 0=stopped
    rngs: jnp.ndarray               # (T,) PRNG keys
    sched: ScheduleArrays
    optim_name: str = struct.field(pytree_node=False)
    p_spec: TreeSpec = struct.field(pytree_node=False)
    s_spec: TreeSpec = struct.field(pytree_node=False)

    @property
    def n_members(self) -> int:
        return self.flat_params.shape[0]

    def next_epoch(self) -> "EnsembleState":
        return self.replace(epoch=self.epoch + 1)

    def member_params_host(self, t: int):
        from mural_tpu.train.packed import unpack_tree_np
        return unpack_tree_np(np.asarray(self.flat_params[t]),
                              self.p_spec)

    def member_stats_host(self, t: int):
        from mural_tpu.train.packed import unpack_tree_np
        return unpack_tree_np(np.asarray(self.flat_stats[t]),
                              self.s_spec)


def create_ensemble_state(variables_list: List[dict], optim_name: str,
                          weight_decays: List[float],
                          schedules: List[LRSchedule],
                          seeds: List[int],
                          device=None) -> EnsembleState:
    """Stack T freshly-initialised member variable trees."""
    T = len(variables_list)
    if not (T == len(weight_decays) == len(schedules) == len(seeds)):
        raise ValueError("ensemble member lists disagree in length")
    p_spec = TreeSpec.of(variables_list[0]["params"])
    s_spec = TreeSpec.of(variables_list[0].get("batch_stats", {}))

    pack_p = jax.jit(lambda t: pack_tree(t, p_spec))
    pack_s = jax.jit(lambda t: pack_tree(t, s_spec))
    flat_params = jnp.stack([pack_p(v["params"]) for v in variables_list])
    flat_stats = (jnp.stack([pack_s(v.get("batch_stats", {}))
                             for v in variables_list])
                  if s_spec.total else jnp.zeros((T, 0), jnp.float32))
    state = EnsembleState(
        flat_params=flat_params,
        flat_stats=flat_stats,
        flat_mask=jnp.ones_like(flat_params),
        opt=_opt_init(optim_name, flat_params),
        step=jnp.zeros((T,), jnp.int32),
        epoch=jnp.zeros((T,), jnp.int32),
        rop_lr=jnp.asarray([s.base_lr for s in schedules], jnp.float32),
        wd=jnp.asarray(weight_decays, jnp.float32),
        live=jnp.ones((T,), jnp.float32),
        rngs=jax.vmap(jax.random.key)(jnp.asarray(seeds, jnp.uint32)),
        sched=ScheduleArrays.from_schedules(schedules),
        optim_name=optim_name,
        p_spec=p_spec,
        s_spec=s_spec,
    )
    return jax.device_put(state, device) if device is not None else state


def make_ensemble_epoch_fn(model, ens: EnsembleState, dw: int,
                           bf16: bool = False):
    """One-dispatch epoch for ALL T members.

    ``epoch_fn(ens, arena, y, cat, cont, astart, neg,
    rows (T, n_steps, B)) -> (new_ens, member_losses (T,))``.

    The resident arrays are shared across members (in_axes=None); each
    member scans its own row permutation.  Per-step math per member is
    the packed/resident step (resident.py:240-287) with the optimizer
    inlined over flat buffers (see _opt_update) so the sampled
    hyperparameters trace instead of baking into the program.
    """
    p_spec, s_spec = ens.p_spec, ens.s_spec
    optim_name = ens.optim_name
    sched_kind = ens.sched.kind
    act_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def one_member(flat_p, flat_s, mask, opt, step0, epoch, rop_lr, wd,
                   live, rng_key, sched_slice, arena, y_all, cat_all,
                   cont_all, astart_all, neg_all, rows):
        def body(carry, rows_b):
            flat_p, flat_s, opt, step = carry
            y = y_all[rows_b].astype(jnp.int32)
            cat = cat_all[rows_b].astype(jnp.int32)
            cont = None if cont_all is None else cont_all[rows_b]
            distal = _gather_onehot(arena, astart_all, neg_all, rows_b,
                                    dw, act_dtype)
            lr = sched_slice.lr_at(step, epoch, rop_lr)
            rng = jax.random.fold_in(rng_key, step)

            def loss_fn(fp):
                params = unpack_tree(fp, p_spec)
                stats = unpack_tree(flat_s, s_spec)
                if act_dtype != jnp.float32:
                    params = jax.tree.map(
                        lambda x: x.astype(act_dtype), params)
                    cont_ = (None if cont is None
                             else cont.astype(act_dtype))
                else:
                    cont_ = cont
                out, mut = model.apply(
                    {"params": params, "batch_stats": stats}, cat,
                    cont_, distal, True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                loss = masked_ce_sum(
                    out, y, jnp.ones(y.shape[0], jnp.float32))
                return loss, pack_tree(mut["batch_stats"], s_spec)

            (loss, new_flat_s), g = jax.value_and_grad(
                loss_fn, has_aux=True)(flat_p)
            u, new_opt = _opt_update(optim_name, g, flat_p, opt, wd)
            new_p = flat_p - lr * u * mask * live
            # a stopped member holds everything (live freeze: no
            # recompile, no further state drift)
            new_flat_s = jnp.where(live > 0, new_flat_s, flat_s)
            new_opt = jax.tree.map(
                lambda a, b: jnp.where(live > 0, a, b), new_opt, opt)
            return (new_p, new_flat_s, new_opt, step + 1), loss

        (flat_p, flat_s, opt, step), losses = jax.lax.scan(
            body, (flat_p, flat_s, opt, step0), rows)
        return flat_p, flat_s, opt, step, jnp.sum(losses)

    member_axes = (0,) * 11 + (None,) * 6 + (0,)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(ens: EnsembleState, arena, y_all, cat_all, cont_all,
                 astart_all, neg_all, rows):
        flat_p, flat_s, opt, step, losses = jax.vmap(
            one_member, in_axes=member_axes)(
                ens.flat_params, ens.flat_stats, ens.flat_mask, ens.opt,
                ens.step, ens.epoch, ens.rop_lr, ens.wd, ens.live,
                ens.rngs, ens.sched, arena, y_all, cat_all, cont_all,
                astart_all, neg_all, rows)
        return ens.replace(flat_params=flat_p, flat_stats=flat_s,
                           opt=opt, step=step), losses

    # ROP/constant schedules carry no step dependence but the same code
    # path works; nothing kind-specific leaks outside lr_at
    del sched_kind
    return epoch_fn


def make_ensemble_eval_fn(model, specs, dw: int):
    """Validation for ALL T members in one dispatch.

    ``eval_fn(flat_p (T,P), flat_s (T,S), res..., rows (n_steps, B),
    masks) -> (logits (T, n_steps, B, C), losses (T,))``.  Validation
    rows are deterministic (no shuffle) and shared across members.
    """
    if isinstance(specs, tuple):
        p_spec, s_spec = specs
    else:
        p_spec, s_spec = specs.p_spec, specs.s_spec

    def one_member(flat_p, flat_s, arena, y_all, cat_all, cont_all,
                   astart_all, neg_all, rows, masks):
        params = unpack_tree(flat_p, p_spec)
        stats = unpack_tree(flat_s, s_spec)
        variables = {"params": params, "batch_stats": stats}

        def body(loss_acc, xs):
            rows_b, mask = xs
            y = y_all[rows_b].astype(jnp.int32)
            cat = cat_all[rows_b].astype(jnp.int32)
            cont = None if cont_all is None else cont_all[rows_b]
            distal = _gather_onehot(arena, astart_all, neg_all, rows_b,
                                    dw, jnp.float32)
            logits = model.apply(variables, cat, cont, distal, False)
            return loss_acc + masked_ce_sum(logits, y, mask), logits

        loss, logits = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (rows, masks))
        return logits, loss

    @jax.jit
    def eval_fn(flat_p, flat_s, arena, y_all, cat_all, cont_all,
                astart_all, neg_all, rows, masks):
        return jax.vmap(one_member,
                        in_axes=(0, 0) + (None,) * 8)(
            flat_p, flat_s, arena, y_all, cat_all, cont_all,
            astart_all, neg_all, rows, masks)

    return eval_fn
