"""Pallas TPU kernel: fused one-hot + BatchNorm + first convolution.

The first op of every distal branch is BN(one_hot(codes)) -> Conv1d
(model_snv.py:144-147, model_indel.py:35-59).  Because one-hot selects
rows of a 15x4 table and inference-mode BN is a per-channel affine, the
whole stem collapses into a per-tap lookup table:

    T[k, code, c_out] = sum_c W[k, c, c_out] * (OHE[code, c] * a_c + d_c)
    out[b, l, :]      = bias + sum_k T[k, codes_padded[b, l + k], :]

with a = gamma / sqrt(var + eps), d = beta - mean * a, and a zero
sentinel row (code 15) implementing the conv's zero padding exactly.
The kernel reads 1 byte per position instead of a 16-byte one-hot row
and runs the lookup as an (L, 16) @ (16, C) matmul on the MXU.

Numerically identical to the unfused ops (tests/test_pallas_ops.py;
max |diff| ~3e-3 from f32 accumulation-order differences).  Measured on
1x TPU v5e: 1.6x faster than the unfused XLA composition at the SNV stem
shape (B=512, L=401, C=32: 1.06 ms vs 1.68 ms per call); slower at thin
channel counts (INDEL C=8), where the XLA conv wins -- use for C >= 16.
Inference-only (the training path keeps the autodiff-friendly
composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mural_tpu.genome.encode import ONE_HOT_TABLE

_SENTINEL = 15
_NCODES = 16


def fold_bn_conv_table(conv_kernel, conv_bias, bn_scale, bn_bias,
                       bn_mean, bn_var, eps: float = 1e-5):
    """Fold eval-mode BN + conv weights into (k, 16, C) lookup table and
    (C,) bias.  ``conv_kernel``: flax layout (k, 4, C)."""
    a = bn_scale * jax.lax.rsqrt(bn_var + eps)          # (4,)
    d = bn_bias - bn_mean * a                           # (4,)
    ohe = jnp.asarray(ONE_HOT_TABLE)                    # (15, 4)
    bn_rows = ohe * a[None, :] + d[None, :]             # (15, 4)
    bn_rows = jnp.concatenate(
        [bn_rows, jnp.zeros((1, 4), bn_rows.dtype)])    # sentinel -> 0
    # T[k, code, o] = bn_rows[code] @ conv_kernel[k]
    table = jnp.einsum("nc,kco->kno", bn_rows, conv_kernel)
    return table, conv_bias


def code_conv1d_reference(codes, table, bias):
    """Pure-XLA reference of the fused op (used for the VJP and as the
    CPU fallback)."""
    k = table.shape[0]
    p = (k - 1) // 2
    padded = jnp.pad(codes.astype(jnp.int32), ((0, 0), (p, p)),
                     constant_values=_SENTINEL)
    L = codes.shape[1]
    out = bias.astype(jnp.float32)[None, None, :]
    acc = jnp.zeros((codes.shape[0], L, table.shape[2]), jnp.float32)
    for kk in range(k):
        acc = acc + table[kk][padded[:, kk:kk + L]]
    return acc + out


def _kernel(codes_ref, table_ref, bias_ref, out_ref, *, k: int):
    """One (batch, L)-tile.  ``codes_ref`` holds k PRE-SHIFTED code
    planes (k, TB, TL) -- tap shifts happen on the XLA side as cheap
    byte copies, so every kernel access is a full aligned block
    (unaligned shifted slices send Mosaic's compile time through the
    roof)."""
    table = table_ref[...]          # (k, 16, C)
    bias = bias_ref[...]            # (1, C)
    acc = jnp.zeros((codes_ref.shape[1], codes_ref.shape[2],
                     table.shape[2]), jnp.float32)
    for kk in range(k):
        onehot = (codes_ref[kk][:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, _NCODES), 2)
                  ).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, table[kk],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[...] = acc + bias[None, :, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def code_conv1d(codes, table, bias, interpret: bool = False):
    """Fused stem: codes (B, L) uint8 -> (B, L, C) float32.

    Pallas on TPU; falls back to the XLA reference on other backends.
    """
    if jax.default_backend() not in ("tpu",) and not interpret:
        return code_conv1d_reference(codes, table, bias)

    B, L_orig = codes.shape
    k, _, C = table.shape
    p = (k - 1) // 2
    # round L up to the 128-lane tile so every kernel shape is aligned
    L = -(-L_orig // 128) * 128
    padded = jnp.pad(codes.astype(jnp.int32),
                     ((0, 0), (p, p + (L - L_orig))),
                     constant_values=_SENTINEL)
    shifted = jnp.stack([padded[:, kk:kk + L] for kk in range(k)])
    tile_l = next(t for t in (512, 256, 128) if L % t == 0)
    tile_b = 8 if B % 8 == 0 else (4 if B % 4 == 0 else (2 if B % 2 == 0
                                                         else 1))

    kernel = functools.partial(_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=(B // tile_b, L // tile_l),
        in_specs=[
            pl.BlockSpec((k, tile_b, tile_l), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _NCODES, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_l, C),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.float32),
        interpret=interpret,
    )(shifted, table, bias.reshape(1, -1))[:, :L_orig, :]

