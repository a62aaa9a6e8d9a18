"""Fused one-hot + BatchNorm + Conv1d + MaxPool1d *training* stem.

The first stage of every SNV distal tower is
``BN(one_hot(codes)) -> Conv1d(k) -> MaxPool1d(pk)`` (ref
MuRaL/model/model_snv.py:144-150 wiring; pools :192-207).  In training
mode that composition dominates the step's HBM traffic: the conv output
``(B, L, C)`` f32 is written once and read back by the pool (~105 MB
each way at B=2048/L=401/C=32), the pool backward scatters another
(B, L, C), and the conv/BN backward reads the gradient again -- round-2
profiling attributed ~0.9 ms of the 2.7 ms f32 step to the k=15 pool
complex plus BN-stat reduces (STATUS.md round-3 roadmap).

The fusion uses the same algebra as the inference stem
(ops/fused_code_conv.py): because the conv input is a one-hot table row
per position and BatchNorm (batch statistics included,
:func:`hist_batch_stats`) is a per-channel affine whose statistics
depend only on the code *histogram*, the stem collapses to a per-tap
lookup table ``T[kk, code, c]``.  BN statistics carry no parameter
dependence (the input is data), so gradients of gamma/beta/W/bias
through ``T`` are mathematically identical to the composition's.

Kernel design (two earlier prototypes are recorded dead ends: the
round-2 ladder/select form measured 3x SLOWER than unfused XLA --
VPU-bound sliding-max plus K=16 MXU-starved matmuls -- and a rank-3
W-packed form failed Mosaic verification: ``tpu.matmul`` requires a
single contracting dim on 2-D operands, no batched contractions):

- pool windows are non-overlapping (stride == kernel), so window ``p``
  depends on exactly ``T = pk + k - 1`` consecutive codes.  The XLA
  side gathers them as ``T`` strided slices into one window per row,
  ``wc (B*P, 128)`` bf16 (codes 0..15 are bf16-exact), lanes past ``T``
  sentinel.
- the table is placement-expanded (XLA side, differentiable einsum
  against a static 0/1 placement tensor) into
  ``U[t*16 + q, j*C + c] = T[t - j, q, c]`` -- all ``pk`` window-offset
  conv outputs become ONE matmul ``onehot(wc) (M, T*16) @ U`` with
  K = T*16 = 272 and N = pk*C = 480 at the tower-2 shape: MXU-sized,
  unlike per-tap K=16 matmuls.
- the kernel builds the one-hot in VMEM (codes -> lane-spread via a
  static 0/1 matmul, compare against ``lane % 16``), runs the matmul,
  masks invalid (p, j) positions, and takes a first-max over the ``pk``
  C-wide lane groups -- the ``(B, L, C)`` conv activation never exists.
- backward: rebuild the one-hot, route ``g`` to the argmax offset
  (lane-spread + compare against the stored ``jstar``), and contract
  ``oh^T @ dOUT -> dU`` as a transpose-lhs matmul (contracting dim 0 of
  both 2-D operands -- Mosaic-supported); ``dU -> dT`` falls out of
  autodiff through the placement einsum.
- conv bias commutes with the window max (same constant for every
  in-window candidate), so it is added outside the kernel and its
  gradient needs no custom handling.

Numerics: matmuls whose both operands are bf16-exact (0/1 one-hots,
small ints) run as single bf16 MXU passes; matmuls with one arbitrary
f32 operand split it into hi+lo bf16 parts (:func:`_split_dot`) -- two
MXU passes accumulated in f32, ~2^-17 relative of the operand, a few
e-5 absolute at unit operand scale (far below BN eps and the unfused
bf16 path's error).  Max-pool ties route to the first window position
(torch MaxPool1d semantics, same rule as models/layers.max_pool1d).
Off-TPU the op falls back to a pure-XLA reference with the same custom
VJP (CPU tests pin fwd/grad parity against the unfused composition;
interpret-mode tests pin the Pallas kernels against the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = 15
_NCODES = 16
_NEG_BIG = -3.0e38          # matches models/layers.max_pool1d's filler
_M_TILE = 512
_BF16 = jnp.bfloat16


def pool_out_len(L: int, pk: int, pp: int) -> int:
    """torch MaxPool1d floor output length (stride == kernel)."""
    return (L + 2 * pp - pk) // pk + 1


def hist_batch_stats(codes):
    """Histogram-exact BatchNorm batch statistics of ``one_hot(codes)``.

    The first BN of a distal tower normalises the one-hot input with
    batch statistics; because every position is a row of the 15-entry
    IUPAC table, ``mean`` and ``E[x^2]`` are exact contractions of the
    code histogram against the table -- no (B, L, 4) activation is ever
    formed.  The input carries no parameter dependence (it is data), so
    treating the statistics as constants leaves every parameter gradient
    identical to the unfused composition's (torch BN on first-layer
    inputs has the same property).

    Returns ``(mean (4,), biased var (4,), unbiased var (4,))`` in f32,
    matching :class:`mural_tpu.models.layers.TorchBatchNorm`'s two-pass
    statistics to f32 round-off.
    """
    from mural_tpu.genome.encode import ONE_HOT_TABLE
    c = codes.astype(jnp.int32)
    n = c.size
    # 15 fused compare+reduce passes.  f32 accumulation is exact only
    # below 2^24 elements; past that (e.g. B=16384 x L=1601) switch to
    # int32 counts (exact to 2^31) so the "histogram-exact" contract
    # holds for every static shape rather than silently rounding.
    acc_dtype = jnp.float32 if n < (1 << 24) else jnp.int32
    cnt = jnp.sum(
        (c[..., None] ==
         jax.lax.broadcasted_iota(jnp.int32, (1,) * c.ndim + (15,),
                                  c.ndim)).astype(acc_dtype),
        axis=tuple(range(c.ndim))).astype(jnp.float32)   # (15,)
    t = jnp.asarray(ONE_HOT_TABLE)                       # (15, 4)
    mean = (cnt @ t) / n
    ex2 = (cnt @ (t * t)) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    unbiased = var * (n / max(n - 1, 1))
    return mean, var, unbiased


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------
# XLA-side prep
# --------------------------------------------------------------------
#
# A pool window depends on T = pk + k - 1 consecutive codes (T <= 128).
# One window per 128-lane row keeps every kernel operand rank-2 (Mosaic
# tpu.matmul takes only 2-D single-contraction operands); the row is
# stored bf16 (codes 0..15 are bf16-exact) to halve the HBM traffic the
# lane padding costs.

def _window_codes(codes, k: int, pk: int, pp: int, P: int):
    """(B, L) codes -> (B*P, 128) bf16, one T-tap pool window per row.

    ``wc[b*P + p, t] = codes[b, p*pk + t - pp - cp]`` (sentinel out of
    range); lanes past ``T`` hold the sentinel (they one-hot into zero
    rows of U).
    """
    B, L = codes.shape
    cp = (k - 1) // 2
    T = pk + k - 1
    if T > 128:
        raise ValueError(f"pool window {pk} + conv {k} too wide: T={T}")
    lo = pp + cp
    need = (P - 1) * pk + T - lo          # highest codes index + 1
    ext = jnp.pad(codes.astype(jnp.int32),
                  ((0, 0), (lo, max(need - L, 0) + 1)),
                  constant_values=_SENTINEL)
    cols = [ext[:, t: t + (P - 1) * pk + 1: pk] for t in range(T)]
    wc = jnp.stack(cols, axis=-1).reshape(B * P, T)
    return jnp.pad(wc, ((0, 0), (0, 128 - T)),
                   constant_values=_SENTINEL).astype(_BF16)


def _placement(k: int, pk: int) -> np.ndarray:
    """Static 0/1 tensor ``sel[t, j, kk] = 1[t == j + kk]``."""
    T = pk + k - 1
    t = np.arange(T)[:, None, None]
    j = np.arange(pk)[None, :, None]
    kk = np.arange(k)[None, None, :]
    return (t == j + kk).astype(np.float32)


def build_u(table, pk: int, Kp: int, Np: int):
    """(k, 16, C) tap table -> (Kp, Np) windowed matmul operand.

    ``U[t*16 + q, j*C + c] = table[t - j, q, c]`` (0 when t - j is
    outside [0, k)); zero-padded to (Kp, Np).  Differentiable: the
    kernel's dU cotangent flows back to dtable through this einsum.
    """
    k, _, C = table.shape
    T = pk + k - 1
    sel = jnp.asarray(_placement(k, pk))                 # (T, pk, k)
    u4 = jnp.einsum("tjk,kqc->tqjc", sel, table)         # (T,16,pk,C)
    u = u4.reshape(T * _NCODES, pk * C)
    return jnp.pad(u, ((0, Kp - T * _NCODES), (0, Np - pk * C)))


def _expand_spread(T: int, Kp: int) -> np.ndarray:
    """(128, Kp) 0/1 lane-spreader: ``(wc @ E)[m, t*16+q] = wc[m, t]``
    for t < T (columns past T*16 stay zero)."""
    E = np.zeros((128, Kp), np.float32)
    for col in range(T * _NCODES):
        E[col // _NCODES, col] = 1.0
    return E


# --------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------


def _split_dot(a01, b, dims):
    """f32-accurate matmul from two bf16 MXU passes.

    ``a01`` holds only values exactly representable in bf16 (0/1
    one-hots, small ints); ``b`` is split into hi + lo bf16 parts whose
    sum reproduces its f32 value to ~2^-16 relative.  Products of an
    exact operand with each part are exact bf16 numbers accumulated in
    f32 -- the same trick XLA's multi-pass f32 matmul uses, at bf16 MXU
    rate.
    """
    bh = b.astype(_BF16)
    bl = (b - bh.astype(jnp.float32)).astype(_BF16)
    a = a01.astype(_BF16)
    hi = jax.lax.dot_general(a, bh, dimension_numbers=dims,
                             preferred_element_type=jnp.float32)
    lo = jax.lax.dot_general(a, bl, dimension_numbers=dims,
                             preferred_element_type=jnp.float32)
    return hi + lo


def _exact_dot(a01, b01, dims):
    """Both operands bf16-exact (one-hots / small ints): one pass."""
    return jax.lax.dot_general(
        a01.astype(_BF16), b01.astype(_BF16), dimension_numbers=dims,
        preferred_element_type=jnp.float32)


def _oh_from_wc(wc_ref, e_ref):
    """(Mt, 128) bf16 codes -> (Mt, Kp) f32 one-hot (in VMEM).

    Spurious ones at columns past T*16 (spread 0 == iota 0) hit only
    zero-padded U / sliced-off dU rows."""
    spread = _exact_dot(wc_ref[...], e_ref[...],
                        (((1,), (0,)), ((), ())))        # (Mt, Kp)
    Kp = spread.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1) % _NCODES
    return (spread == q.astype(jnp.float32)).astype(jnp.float32)


def _fwd_kernel(wc_ref, u_ref, e_ref, out_ref, js_ref, *, pk: int,
                C: int, P: int, L: int, pp: int, mt: int,
                split: bool):
    from jax.experimental import pallas as pl_mod
    oh = _oh_from_wc(wc_ref, e_ref)                      # (Mt, Kp)
    dims = (((1,), (0,)), ((), ()))
    outn = (_split_dot(oh, u_ref[...], dims) if split
            else _exact_dot(oh, u_ref[...].astype(_BF16), dims))
    Mt, Np = outn.shape                                  # (Mt, Np)
    # validity of window p offset j -- pp <= p*pk + j < L + pp (torch
    # -inf pool padding) -- is per-(row, j): a (Mt, 1) mask inside the
    # max loop, not an (Mt, Np)-domain iota/compare complex
    p = (jax.lax.broadcasted_iota(jnp.int32, (Mt, 1), 0)
         + pl_mod.program_id(0) * mt) % P
    i0 = p * pk                          # conv index of offset j == 0

    def masked(jj):
        v = outn[:, jj * C:(jj + 1) * C]
        if pp == 0 and (P - 1) * pk + pk <= L:
            return v                     # every offset always in range
        ok = (i0 + jj >= pp) & (i0 + jj < L + pp)
        return jnp.where(ok, v, _NEG_BIG)

    best = masked(0)
    bestj = jnp.zeros((Mt, C), jnp.int32)
    for jj in range(1, pk):
        v = masked(jj)
        upd = v > best                   # strict: first max wins ties
        best = jnp.where(upd, v, best)
        bestj = jnp.where(upd, jj, bestj)
    out_ref[...] = best.astype(jnp.float32)
    js_ref[...] = bestj


def _bwd_kernel(wc_ref, g_ref, js_ref, e_ref, du_ref, *, pk: int,
                C: int, mt: int, split: bool):
    from jax.experimental import pallas as pl_mod
    oh = _oh_from_wc(wc_ref, e_ref)                      # (Mt, Kp)
    g = g_ref[...]                                       # (Mt, C) f32
    js = js_ref[...]                                     # (Mt, C) i32
    # route g to the argmax offset: dout[:, j*C+c] = g[., c][js == j]
    Np = du_ref.shape[1]
    pieces = [jnp.where(js == jj, g, 0.0) for jj in range(pk)]
    if Np > pk * C:
        pieces.append(jnp.zeros((g.shape[0], Np - pk * C), jnp.float32))
    dout = jnp.concatenate(pieces, axis=1)               # (Mt, Np)
    # dU = oh^T @ dout: transpose-lhs matmul, oh is the exact operand
    cdims = (((0,), (0,)), ((), ()))
    du = (_split_dot(oh, dout, cdims) if split
          else _exact_dot(oh, dout.astype(_BF16), cdims))
    first = pl_mod.program_id(0) == 0

    @pl_mod.when(first)
    def _init():
        du_ref[...] = du

    @pl_mod.when(jnp.logical_not(first))
    def _acc():
        du_ref[...] = du_ref[...] + du


# --------------------------------------------------------------------
# Windowed-matmul core with custom VJP (Pallas on TPU)
# --------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _win_pool(wc, u, k: int, pk: int, C: int, P: int, L: int, pp: int,
              split: bool, interpret: bool):
    """wc (M, 128) bf16 (one window per row), u (Kp, Np) f32 ->
    pooled (M, C) f32."""
    pooled, _ = _win_pool_fwd_impl(wc, u, k, pk, C, P, L, pp, split,
                                   interpret)
    return pooled


def _win_pool_vfwd(wc, u, k, pk, C, P, L, pp, split, interpret):
    pooled, jstar = _win_pool_fwd_impl(wc, u, k, pk, C, P, L, pp,
                                       split, interpret)
    return pooled, (wc, jstar, np.array(u.shape))


def _win_pool_vbwd(k, pk, C, P, L, pp, split, interpret, res, g):
    wc, jstar, u_shape = res
    Kp, Np = (int(x) for x in u_shape)
    du = _win_pool_bwd_impl(wc, jstar, g, k, Kp, Np, pk, C, split,
                            interpret)
    ct_wc = np.zeros(wc.shape, dtype=jax.dtypes.float0)
    return ct_wc, du


_win_pool.defvjp(_win_pool_vfwd, _win_pool_vbwd)


def _win_pool_fwd_impl(wc, u, k, pk, C, P, L, pp, split, interpret):
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    M = wc.shape[0]
    Kp, Np = u.shape
    T = pk + k - 1
    mt = min(_M_TILE, M)
    kernel = functools.partial(_fwd_kernel, pk=pk, C=C, P=P, L=L,
                               pp=pp, mt=mt, split=split)
    pooled, jstar = pl_mod.pallas_call(
        kernel,
        grid=(M // mt,),
        in_specs=[
            pl_mod.BlockSpec((mt, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((Kp, Np), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((128, Kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl_mod.BlockSpec((mt, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((mt, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, C), jnp.float32),
            jax.ShapeDtypeStruct((M, C), jnp.int32),
        ],
        interpret=interpret,
    )(wc, u, jnp.asarray(_expand_spread(T, Kp)))
    return pooled, jstar


def _win_pool_bwd_impl(wc, jstar, g, k, Kp, Np, pk, C, split,
                       interpret):
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    M = wc.shape[0]
    T = pk + k - 1
    mt = min(_M_TILE, M)
    kernel = functools.partial(_bwd_kernel, pk=pk, C=C, mt=mt,
                               split=split)
    du = pl_mod.pallas_call(
        kernel,
        grid=(M // mt,),
        in_specs=[
            pl_mod.BlockSpec((mt, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((mt, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((mt, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((128, Kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
        ],
        out_specs=pl_mod.BlockSpec((Kp, Np), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
        interpret=interpret,
    )(wc, g.astype(jnp.float32), jstar,
      jnp.asarray(_expand_spread(T, Kp)))
    return du


# --------------------------------------------------------------------
# Reference (pure XLA) implementation -- CPU fallback and test oracle
# --------------------------------------------------------------------

def _shifted_planes(codes, k: int, pp: int, Lp: int):
    """(B, L) codes -> (k, B, Lp) int32 tap planes.

    plane[kk][b, i] = codes[b, (i - pp) + kk - cp] with sentinel out of
    range, where i indexes the pool-padded conv axis (l = i - pp) and
    cp = (k-1)//2 is the conv padding.
    """
    B, L = codes.shape
    cp = (k - 1) // 2
    lo = pp + cp
    hi = max(Lp - pp + k - 1 - cp - L, 0)
    ext = jnp.pad(codes.astype(jnp.int32), ((0, 0), (lo, hi)),
                  constant_values=_SENTINEL)
    return jnp.stack([ext[:, kk:kk + Lp] for kk in range(k)])


def _reference_fwd(codes, table, bias, pk, pp):
    """Unfused-algebra oracle; returns (pooled, jstar) with jstar the
    in-window argmax offset (torch first-max tie routing)."""
    k = table.shape[0]
    B, L = codes.shape
    P = pool_out_len(L, pk, pp)
    Lp = P * pk
    planes = _shifted_planes(codes, k, pp, Lp)           # (k, B, Lp)
    acc = jnp.zeros((B, Lp, table.shape[2]), jnp.float32)
    t32 = table.astype(jnp.float32)
    for kk in range(k):
        acc = acc + t32[kk][planes[kk]]
    acc = acc + bias.astype(jnp.float32)[None, None, :]
    i_iota = jnp.arange(Lp)[None, :, None]
    valid = (i_iota >= pp) & (i_iota < L + pp)
    acc = jnp.where(valid, acc, _NEG_BIG)
    xw = acc.reshape(B, P, pk, acc.shape[2])
    pooled = jnp.max(xw, axis=2)
    jstar = jnp.argmax(xw, axis=2).astype(jnp.int32)
    return pooled, jstar


def _reference_bwd(codes, table_shape, pk, pp, jstar, g):
    k, _, C = table_shape
    B, L = codes.shape
    P = g.shape[1]
    Lp = P * pk
    planes = _shifted_planes(codes, k, pp, Lp)           # (k, B, Lp)
    # scatter g to the conv axis at the argmax offsets
    j_iota = jnp.arange(pk, dtype=jnp.int32)[None, None, :, None]
    gw = jnp.where(j_iota == jstar[:, :, None, :],
                   g[:, :, None, :].astype(jnp.float32), 0.0)
    gfull = gw.reshape(B, Lp, C)
    oh = jax.nn.one_hot(planes, _NCODES, dtype=jnp.float32)  # (k,B,Lp,16)
    dtable = jnp.einsum("kbln,blc->knc", oh, gfull)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return dtable, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _code_conv_pool_ref(codes, table, bias, pk: int, pp: int):
    pooled, _ = _reference_fwd(codes, table, bias, pk, pp)
    return pooled


def _ref_vfwd(codes, table, bias, pk, pp):
    pooled, jstar = _reference_fwd(codes, table, bias, pk, pp)
    return pooled, (codes, jstar, np.array(table.shape))


def _ref_vbwd(pk, pp, res, g):
    codes, jstar, t_shape = res
    dtable, dbias = _reference_bwd(codes,
                                   tuple(int(x) for x in t_shape),
                                   pk, pp, jstar, g)
    ct_codes = np.zeros(codes.shape, dtype=jax.dtypes.float0)
    return ct_codes, dtable, dbias


_code_conv_pool_ref.defvjp(_ref_vfwd, _ref_vbwd)


# --------------------------------------------------------------------
# Public op
# --------------------------------------------------------------------

def _use_pallas(interpret: bool) -> bool:
    return interpret or jax.default_backend() == "tpu"


def code_conv_pool(codes, table, bias, pk: int, pp: int,
                   interpret: bool = False, split: bool = True):
    """codes (B, L) uint8, table (k, 16, C), bias (C,) ->
    pooled (B, P, C) f32.

    The fused BN->Conv1d->MaxPool1d training stem; see module docstring.
    ``pk``/``pp`` are the pool kernel(==stride) and padding; the table's
    sentinel row 15 must be zero (conv zero padding).  Gradients flow to
    ``table`` and ``bias``; ``codes`` is non-differentiable data.
    ``split=True`` runs f32-accurate hi+lo bf16 matmul pairs (the f32
    training path); ``split=False`` runs single bf16 MXU passes -- the
    same rounding the unfused bf16 path pays, at half the MXU work
    (use under ``--bf16`` training).
    """
    B, L = codes.shape
    k, _, C = table.shape
    P = pool_out_len(L, pk, pp)
    if not _use_pallas(interpret):
        return _code_conv_pool_ref(codes, table.astype(jnp.float32),
                                   bias.astype(jnp.float32), pk, pp)
    T = pk + k - 1
    Kp = _round_up(T * _NCODES, 128)
    Np = _round_up(pk * C, 128)
    wc = _window_codes(codes, k, pk, pp, P)              # (B*P, 128)
    M = B * P
    mt = min(_M_TILE, _round_up(M, 16))   # bf16 sublane tile is 16
    Mp = _round_up(M, mt)
    if Mp > M:
        wc = jnp.pad(wc, ((0, Mp - M), (0, 0)),
                     constant_values=_SENTINEL)
    u = build_u(table.astype(jnp.float32), pk, Kp, Np)   # differentiable
    pooled = _win_pool(wc, u, k, pk, C, P, L, pp, split, interpret)
    pooled = pooled[:M].reshape(B, P, C)
    return pooled + bias.astype(jnp.float32)[None, None, :]
