"""Device-resident training data: the epoch as one XLA dispatch.

The host-feed gap was the round-2 bottleneck: the training path gathered
(B, W) uint8 distal windows on host and shipped them per batch, capping
the end-to-end epoch rate at ~48k windows/s against a 713k-1M device
step rate (the host hot loop the reference acknowledges at
MuRaL/data/preprocessing.py:937-944 and commands/train.py:536-541).

This module removes the host from the steady-state loop entirely:

- **arena**: the union of all radius-expanded site windows, merged into
  super-intervals per chromosome (the reference's shared-encoding idea,
  preprocessing.py:571-615, but as a flat device-resident uint8 array),
  uploaded once per trial.  Each site stores its window start in arena
  coordinates; positions outside the chromosome hold N, matching
  ``genome.encode.gather_windows`` exactly.
- **per-site arrays**: labels, k-mer ids, continuous features, window
  starts and strand flags, uploaded once.
- **epoch scan**: the host computes the segment-pool permutation (the
  *same* ``iter_batch_rows`` the host path uses, consuming the same rng
  draws), uploads one (n_steps, B) int32 row array, and dispatches a
  single ``lax.scan`` that gathers, one-hot-encodes and trains in-graph.
  Per epoch the host sends one index array and receives one loss vector.

Strand handling never touches a device-side complement table (16-entry
gathers lower to serial dynamic-slice loops on TPU):
``one_hot(revcomp(codes)) == one_hot(codes)[:, ::-1, ::-1]`` -- IUPAC
complement is exactly the A<->T / C<->G channel swap and the one-hot
table is A,C,G,T-ordered, so both reverses are free relayouts that XLA
fuses (bit-equality asserted in tests/test_resident.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import N_CODE
from mural_tpu.models.layers import one_hot_from_codes
from mural_tpu.train.packed import (PackedTrainState, pack_tree,
                                    unpack_tree)
from mural_tpu.train.steps import masked_ce_sum


def build_arena(ds):
    """Merged-window code arena for a :class:`SiteDataset`.

    Returns ``(arena uint8 (A,), astart (n_sites,))`` where
    ``arena[astart[i] : astart[i] + ds.distal_width]`` equals the
    forward-strand window ``gather_windows`` would produce for site i
    (reverse-complementing stays in-graph, see module docstring).
    ``astart`` is int32 when the arena allows it, else int64.
    """
    dw = ds.distal_width
    gstart = enc.expanded_start(ds.start, ds.distal_radius, ds.model_type)
    astart = np.empty(ds.n_sites, dtype=np.int64)
    pieces = []
    base = 0
    for cid in np.unique(ds.chrom_id) if ds.n_sites else []:
        m = np.where(ds.chrom_id == cid)[0]
        s = gstart[m]
        order = np.argsort(s, kind="stable")
        s_sorted = s[order]
        hi = s_sorted + dw
        run_hi = np.maximum.accumulate(hi)
        new = np.empty(len(s_sorted), dtype=bool)
        new[0] = True
        new[1:] = s_sorted[1:] > run_hi[:-1]
        grp = np.cumsum(new) - 1
        glo = s_sorted[new]
        ghi = run_hi[np.concatenate([new[1:], [True]])]
        lens = ghi - glo
        offsets = base + np.concatenate([[0], np.cumsum(lens[:-1])])
        astart[m[order]] = offsets[grp] + (s_sorted - glo[grp])
        # vectorized interval copy: arena position k of group j maps to
        # genome position k + (glo[j] - local_offset[j])
        total = int(lens.sum())
        pos = (np.arange(total, dtype=np.int64)
               + np.repeat(glo - (offsets - base), lens))
        codes = ds.chrom_codes[cid]
        n = len(codes)
        piece = np.where((pos >= 0) & (pos < n),
                         codes[np.clip(pos, 0, max(n - 1, 0))],
                         N_CODE).astype(np.uint8)
        pieces.append(piece)
        base += total
    arena = (np.concatenate(pieces) if pieces
             else np.zeros(dw, dtype=np.uint8))
    if len(arena) < dw:                      # degenerate tiny dataset
        arena = np.concatenate(
            [arena, np.full(dw - len(arena), N_CODE, dtype=np.uint8)])
    if len(arena) < np.iinfo(np.int32).max - dw:
        astart = astart.astype(np.int32)
    return arena, astart


def estimate_resident_bytes(ds) -> int:
    """Upper bound on device bytes for :func:`make_resident` (arena is
    bounded by the merged-interval union, itself bounded by both the
    genome size and n_sites * window)."""
    dw = ds.distal_width
    arena_bound = min(sum(len(c) for c in ds.chrom_codes) + 2 * dw,
                      ds.n_sites * dw + 2 * dw)
    cat_itemsize = np.dtype(_smallest_int(ds.cat)).itemsize
    per_site = (1 + cat_itemsize * ds.cat.shape[1] + 8 + 1
                + (4 * ds.n_cont if ds.cont is not None else 0))
    return arena_bound + per_site * ds.n_sites


@dataclasses.dataclass
class ResidentData:
    """Per-trial device-resident copies of one :class:`SiteDataset`."""
    arena: jnp.ndarray          # (R, 128) uint8 row-blocked code arena
    y: jnp.ndarray              # (n,) int32
    cat: jnp.ndarray            # (n, K) int32
    cont: Optional[jnp.ndarray]  # (n, C) f32 or None
    astart: jnp.ndarray         # (n,) int32|int64 arena window starts
    neg: jnp.ndarray            # (n,) bool
    distal_width: int
    n_sites: int


def _smallest_int(a: np.ndarray):
    """Smallest signed/unsigned integer dtype that holds ``a``
    losslessly (non-negative arrays assumed, as k-mer ids are)."""
    if a.size == 0 or a.max() < 256:
        return np.uint8
    if a.max() < 2 ** 15:
        return np.int16
    return np.int32


def make_resident(ds, device=None) -> Optional[ResidentData]:
    """Build and upload the resident arrays; None if the dataset needs
    the host path (per-base distal track channels stream from the host
    prefix-sum backend and are not resident).

    The arena uploads row-blocked (R, 128) for the 128-byte-granular
    gather (ops/window_gather.py -- the element-granular form was the
    round-3 bottleneck)."""
    if ds.distal_tracks is not None:
        return None
    from mural_tpu.ops.window_gather import pad_arena_rows
    arena, astart = build_arena(ds)
    put = partial(jax.device_put, device=device)
    return ResidentData(
        arena=put(pad_arena_rows(arena, ds.distal_width)),
        # narrowest lossless dtypes: the one-time upload rides a
        # (possibly slow) host->device transport and is the resident
        # path's whole startup cost at 10M+ sites (k-mer ids are
        # < 4**local_order + 1, labels < n_class <= 255); the epoch
        # body casts back to int32 on device
        y=put(ds.y.astype(np.uint8 if ds.y.size == 0
                          or ds.y.max() < 256 else np.int32)),
        cat=put(ds.cat.astype(_smallest_int(ds.cat))),
        cont=None if ds.cont is None else put(ds.cont),
        astart=put(astart),
        neg=put(ds.strand_neg.astype(bool)),
        distal_width=ds.distal_width,
        n_sites=ds.n_sites,
    )


def _gather_onehot(arena2d, astart_all, neg_all, rows, dw, dtype,
                   cast_to=None):
    """(B,) row ids -> (B, dw, 4) one-hot windows, strand-resolved."""
    from mural_tpu.ops.window_gather import gather_windows_blocked
    a = astart_all[rows]
    win = gather_windows_blocked(arena2d, a, dw)
    oh = one_hot_from_codes(win, dtype)
    neg = neg_all[rows]
    return jnp.where(neg[:, None, None], oh[:, ::-1, ::-1], oh)


def _gather_codes(arena2d, astart_all, neg_all, rows, dw):
    """(B,) row ids -> (B, dw) int32 codes, strand-resolved.

    The fused-stem variant of :func:`_gather_onehot`: negative-strand
    windows are reverse-complemented at the code level.  The 16-entry
    complement permutation runs as an iota-compare matmul (small-table
    gathers lower to serial dynamic-slice loops on TPU); values 0..15
    are exactly representable in f32 so the round-trip is lossless.
    """
    from mural_tpu.genome.fasta import COMPLEMENT
    from mural_tpu.ops.window_gather import gather_windows_blocked
    a = astart_all[rows]
    win = gather_windows_blocked(arena2d, a, dw).astype(jnp.int32)
    comp_t = jnp.concatenate(
        [jnp.asarray(COMPLEMENT, jnp.float32),
         jnp.asarray([15.0], jnp.float32)]).reshape(16, 1)
    oh = (win[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
          ).astype(jnp.float32)
    comp = jax.lax.dot_general(
        oh, comp_t, dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)[:, :, 0].astype(jnp.int32)
    neg = neg_all[rows]
    return jnp.where(neg[:, None], comp[:, ::-1], win)


def make_resident_epoch_fn(model, pstate: PackedTrainState, dw: int,
                           bf16: bool = False,
                           fused_stem: bool = False,
                           mesh=None):
    """One-dispatch training epoch over resident data.

    ``epoch_fn(ps, res_args..., rows (n_steps, B), base_rng) ->
    (new_ps, total_loss, last_lr)``.  The per-step math (rng fold_in by
    ps.step, masked CE-sum, optimizer update) is identical to
    ``make_packed_train_step``, so an epoch here equals the host-fed
    epoch batch for batch (tests/test_resident.py).

    ``mesh``: data-parallel resident epochs.  State and resident arrays
    replicate, ``rows`` shards on its batch axis (P(None, 'data')); XLA
    derives the per-step gradient/BN-stat all-reduce over ICI from the
    shardings, exactly like the per-step DP path
    (``packed.make_packed_train_step`` under ``--dp_devices``), but the
    whole epoch stays one dispatch."""
    p_spec, s_spec, tx = pstate.p_spec, pstate.s_spec, pstate.tx
    act_dtype = jnp.bfloat16 if bf16 else jnp.float32

    if mesh is None:
        jit = partial(jax.jit, donate_argnums=(0,))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        rows_sh = NamedSharding(mesh, P(None, "data"))
        jit = partial(
            jax.jit, donate_argnums=(0,),
            in_shardings=(rep, rep, rep, rep, rep, rep, rep, rows_sh,
                          rep),
            out_shardings=(rep, rep, rep))

    @jit
    def epoch_fn(ps: PackedTrainState, arena, y_all, cat_all, cont_all,
                 astart_all, neg_all, rows, base_rng):
        def body(ps, rows_b):
            y = y_all[rows_b].astype(jnp.int32)
            cat = cat_all[rows_b].astype(jnp.int32)
            cont = None if cont_all is None else cont_all[rows_b]
            if fused_stem:
                distal = _gather_codes(arena, astart_all, neg_all,
                                       rows_b, dw)
            else:
                distal = _gather_onehot(arena, astart_all, neg_all,
                                        rows_b, dw, act_dtype)
            lr = ps.lr()
            rng = jax.random.fold_in(base_rng, ps.step)

            def loss_fn(flat_p):
                params = unpack_tree(flat_p, p_spec)
                stats = unpack_tree(ps.flat_stats, s_spec)
                if act_dtype != jnp.float32:
                    params = jax.tree.map(
                        lambda x: x.astype(act_dtype), params)
                    if cont is not None:
                        cont_ = cont.astype(act_dtype)
                    else:
                        cont_ = None
                else:
                    cont_ = cont
                variables = {"params": params, "batch_stats": stats}
                out, mut = model.apply(variables, cat, cont_, distal,
                                       True, rngs={"dropout": rng},
                                       mutable=["batch_stats"])
                loss = masked_ce_sum(
                    out, y, jnp.ones(y.shape[0], jnp.float32))
                return loss, pack_tree(mut["batch_stats"], s_spec)

            (loss, new_flat_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ps.flat_params)
            updates, opt_state = tx.update(grads, ps.opt_state,
                                           ps.flat_params)
            flat_params = ps.flat_params - lr * updates * ps.flat_mask
            return ps.replace(flat_params=flat_params,
                              flat_stats=new_flat_stats,
                              opt_state=opt_state,
                              step=ps.step + 1), (loss, lr)

        ps, (losses, lrs) = jax.lax.scan(body, ps, rows)
        return ps, jnp.sum(losses), lrs[-1]

    return epoch_fn


def make_resident_eval_fn(model, specs, dw: int,
                          fused_stem: bool = False,
                          mesh=None):
    """One-dispatch validation pass over resident data.

    ``eval_fn(flat_p, flat_s, res_args..., rows (n_steps, B),
    masks (n_steps, B)) -> (logits (n_steps, B, n_class), loss_sum)``.
    ``mesh``: batch-sharded validation (see make_resident_epoch_fn).
    """
    if isinstance(specs, tuple):
        p_spec, s_spec = specs
    else:
        p_spec, s_spec = specs.p_spec, specs.s_spec

    if mesh is None:
        jit = jax.jit
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        rows_sh = NamedSharding(mesh, P(None, "data"))
        jit = partial(
            jax.jit,
            in_shardings=(rep, rep, rep, rep, rep, rep, rep, rep,
                          rows_sh, rows_sh),
            out_shardings=(NamedSharding(mesh, P(None, "data", None)),
                           rep))

    @jit
    def eval_fn(flat_p, flat_s, arena, y_all, cat_all, cont_all,
                astart_all, neg_all, rows, masks):
        params = unpack_tree(flat_p, p_spec)
        stats = unpack_tree(flat_s, s_spec)
        variables = {"params": params, "batch_stats": stats}

        def body(loss_acc, xs):
            rows_b, mask = xs
            y = y_all[rows_b].astype(jnp.int32)
            cat = cat_all[rows_b].astype(jnp.int32)
            cont = None if cont_all is None else cont_all[rows_b]
            if fused_stem:
                distal = _gather_codes(arena, astart_all, neg_all,
                                       rows_b, dw)
            else:
                distal = _gather_onehot(arena, astart_all, neg_all,
                                        rows_b, dw, jnp.float32)
            logits = model.apply(variables, cat, cont, distal, False)
            return loss_acc + masked_ce_sum(logits, y, mask), logits

        loss, logits = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (rows, masks))
        return logits, loss

    return eval_fn


def stack_epoch_rows(ds, sampled_segments: int, batch_size: int,
                     shuffle: bool, rng=None, pad_final: bool = False):
    """Host-side epoch permutation as stacked arrays.

    Returns ``(rows (n_steps, B) int32, masks (n_steps, B) f32,
    n_valids list)`` in the exact order ``segment_pool_batches`` would
    emit (shared ``iter_batch_rows`` core, same rng draws).
    """
    from mural_tpu.data.batcher import iter_batch_rows
    rows_list, n_valids = [], []
    for rows, n_valid in iter_batch_rows(ds, sampled_segments, batch_size,
                                         shuffle=shuffle, rng=rng,
                                         pad_final=pad_final):
        rows_list.append(rows.astype(np.int32))
        n_valids.append(n_valid)
    if not rows_list:
        return (np.zeros((0, batch_size), np.int32),
                np.zeros((0, batch_size), np.float32), [])
    rows = np.stack(rows_list)
    masks = (np.arange(batch_size)[None, :]
             < np.asarray(n_valids)[:, None]).astype(np.float32)
    return rows, masks, n_valids
