"""Building blocks with exact parity to the reference's torch layers.

Layout convention: activations are channels-last ``(N, L, C)`` -- the
natural layout for TPU convolutions (XLA maps them onto the MXU without
transposes), whereas the reference uses torch's ``(N, C, L)``.

Cited reference behaviours:
- ``nn.MaxPool1d(k, s, p)`` pads with -inf and uses floor output length
  (model_snv.py:150,192,197,207).
- ``ResBlock`` is pre-activation ReLU->BN->Conv twice with a length-cropped
  residual (model_snv.py:794-812).
- ``nn.BatchNorm1d`` defaults: eps=1e-5, momentum=0.1 (i.e. running stats
  decay 0.9 in flax terms).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mural_tpu.genome.encode import ONE_HOT_TABLE

def _onehot_dot(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Table lookup as iota-compare + ``Precision.HIGHEST`` matmul.

    TPU lowers small-table gathers to serial dynamic-slice loops and
    their backward to scatter-adds; the one-hot matmul runs both
    directions on the MXU and is bit-identical (each output row is
    ``1.0 * table[idx]`` plus exact zeros, which f32 accumulation never
    rounds).  Out-of-range indices one-hot to nothing (zero row)."""
    n = table.shape[0]
    oh = (idx[..., None].astype(jnp.int32) ==
          jax.lax.broadcasted_iota(jnp.int32, (1,) * idx.ndim + (n,),
                                   idx.ndim)).astype(table.dtype)
    return jax.lax.dot_general(
        oh, table, dimension_numbers=(((idx.ndim,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def one_hot_from_codes(codes: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """uint8 genome codes (N, L) -> fractional one-hot (N, L, 4).

    This is the device-side replacement for the reference's host
    ``seq_ohe_encoder`` (preprocessing.py:756-816).

    Implemented via :func:`_onehot_dot` (the gather lowered to a serial
    dynamic-slice loop profiled at ~1.5 ms for a (2048, 401) batch -- a
    third of the whole train step; the compare+dot form is ~0.1 ms and
    bit-identical, tests/test_models.py::test_one_hot_matches_table_gather).

    The table is materialised lazily (usually inside a trace, where it
    becomes a compile-time constant): a module-level ``jnp.asarray``
    would initialise the XLA backend at import time, which breaks
    ``jax.distributed.initialize`` ordering and pins the default device
    prematurely.  Codes are 0..14 (N_CODE pads out-of-genome); the
    16th table row is zero so a 15 sentinel one-hots to nothing.
    """
    table = jnp.asarray(np.concatenate(
        [ONE_HOT_TABLE, np.zeros((1, 4), np.float32)]), dtype)
    return _onehot_dot(codes, table)


@jax.custom_vjp
def _windowed_first_max(xw: jnp.ndarray) -> jnp.ndarray:
    """(N, P, k, C) -> (N, P, C) max over the window axis, with a VJP
    that routes each window's gradient to the FIRST position attaining
    the max -- torch MaxPool1d's tie rule, and the same rule XLA's
    select-and-scatter uses, but expressed as fusable elementwise ops
    instead of the (slow, serially-lowered) select-and-scatter."""
    return jnp.max(xw, axis=2)


def _windowed_first_max_fwd(xw):
    # residual is only the (first-)argmax index plus a size-k stub to
    # carry the static window size/dtype: the backward then reads k
    # times less data than a mask-over-xw formulation.  int16 indices
    # (window size is at most a few hundred) halve the broadcast-compare
    # traffic of the backward; guard the dtype assumption so a future
    # giant-window pool fails loudly instead of wrapping silently.
    if xw.shape[2] > 32767:
        raise ValueError(
            f"pool window {xw.shape[2]} exceeds the int16 index range")
    idx = jnp.argmax(xw, axis=2).astype(jnp.int16)
    return jnp.max(xw, axis=2), (idx, jnp.zeros((xw.shape[2],), xw.dtype))


def _windowed_first_max_bwd(res, g):
    idx, stub = res
    k = stub.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int16, (1, 1, k, 1), 2)
    mask = iota == idx[:, :, None, :]
    return (jnp.where(mask, g[:, :, None, :], 0).astype(stub.dtype),)


_windowed_first_max.defvjp(_windowed_first_max_fwd,
                           _windowed_first_max_bwd)


class OneHotEmbed(nn.Module):
    """Drop-in ``nn.Embed`` (same ``embedding`` param, same init) whose
    lookup is iota-compare + a ``Precision.HIGHEST`` matmul instead of a
    gather.

    TPU lowers small-table gathers to serial dynamic-slice loops and the
    embedding *backward* to a scatter-add (profiled at ~0.2 ms/step of
    the SNV train step); the one-hot matmul runs both directions on the
    MXU.  Bit-identical: each output row is ``1.0 * table[idx]`` plus
    exact zeros, and the gradient is the exact transpose.
    """
    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal",
                                             out_axis=0),
            (self.num_embeddings, self.features))
        return _onehot_dot(idx, table)


@jax.custom_vjp
def global_max_1d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, L, C) -> (N, C) max over the length axis with an
    argmax-residual VJP (torch ``max(dim)`` first-index tie routing).

    The default ``jnp.max`` VJP compares the input against the stored
    max to locate it; under XLA fusion/rematerialisation in the bf16
    mixed-precision path the comparison can run against a
    differently-rounded recompute and match NOWHERE, silently zeroing
    the gradient of everything upstream (observed on the INDEL U-Net
    head: every encoder/decoder gradient exactly 0).  Routing through
    the stored argmax index is immune to that."""
    return jnp.max(x, axis=1)


def _global_max_1d_fwd(x):
    idx = jnp.argmax(x, axis=1).astype(jnp.int32)
    return jnp.max(x, axis=1), (idx, jnp.zeros((x.shape[1],), x.dtype))


def _global_max_1d_bwd(res, g):
    idx, stub = res
    L = stub.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1)
    mask = iota == idx[:, None, :]
    return (jnp.where(mask, g[:, None, :], 0).astype(stub.dtype),)


global_max_1d.defvjp(_global_max_1d_fwd, _global_max_1d_bwd)


def max_pool1d(x: jnp.ndarray, kernel: int, stride: int,
               padding: int) -> jnp.ndarray:
    """torch.nn.MaxPool1d semantics on (N, L, C): low padding, floor len.

    Padding is applied by concatenating a large-finite filler instead of
    reduce_window's -inf window padding: on TPU the max-pool VJP emits
    NaN gradients when -inf padding participates in a window (observed
    data-dependently at larger batch sizes).  A finite filler below any
    real activation keeps forward semantics identical and the backward
    routes gradients to the true argmax only.

    For the ``stride == kernel`` case (every pool in this model family:
    torch MaxPool1d's default stride is the kernel) the windows are
    non-overlapping, so the pool is a reshape + small-axis max with an
    elementwise first-max VJP -- profiled at ~0.7 ms/step cheaper than
    reduce_window + select-and-scatter on the SNV train step.
    """
    if padding:
        fill = jnp.full((x.shape[0], padding, x.shape[2]), -3.0e38,
                        x.dtype)
        x = jnp.concatenate([fill, x, fill], axis=1)
    if stride == kernel:
        n, L, c = x.shape
        P = L // kernel
        xw = x[:, :P * kernel, :].reshape(n, P, kernel, c)
        return _windowed_first_max(xw)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (0, 0), (0, 0)),
    )


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """torch.nn.Upsample(scale_factor=scale, mode='nearest') on (N, L, C)."""
    return jnp.repeat(x, scale, axis=1)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch.nn.BatchNorm1d semantics.

    Differences from ``flax.linen.BatchNorm`` that matter for checkpoint
    and loss parity: torch updates running_var with the *unbiased*
    (n/(n-1)) batch variance while normalising with the biased one, and
    uses update rule ``new = (1-m)*old + m*batch`` with m=0.1.
    Channels-last; reduces over all leading axes.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        # statistics dtype: f32 for f32/bf16 activations (for bf16 this
        # keeps the large reductions and running-stat updates full
        # precision), f64 under an x64 trace (the bench's double-
        # precision torch-parity run)
        stat_dt = jnp.promote_types(x.dtype, jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(stat_dt)
            # single-pass shifted statistics: mean and variance from ONE
            # read of x (both reductions fuse into one multi-output
            # reduce of d).  A naive E[x^2]-E[x]^2 cancels
            # catastrophically when mean^2 >> var (can go negative ->
            # rsqrt NaN; this repo hit that once), and the safe two-pass
            # E[(x-mean)^2] costs a second full HBM read because the
            # second reduce depends on the first (~2 ms of convert_
            # reduce per INDEL U-Net step).  Shifting by the running
            # mean keeps the subtraction benign: the f32 error of the
            # shifted form is ~2^-24 * (var + (mean-shift)^2), which
            # stays far below eps=1e-5 whenever |mean - running_mean|
            # < ~10 -- running stats track the batch mean within steps
            # (and at init shift=0 reproduces the naive form, whose
            # error is still << eps for the unit-scale activations BN
            # sees at init).  Clamp handles the var~0 edge exactly as
            # the two-pass did.
            shift = jax.lax.stop_gradient(ra_mean.value)
            d = x32 - shift
            mean_d = jnp.mean(d, axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(d), axes) - jnp.square(mean_d), 0.0)
            mean = mean_d + shift
            n = x.size // feat
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon)
        if x.dtype == stat_dt:
            return (x - mean) * inv * scale + bias
        # low-precision activations: normalise in f32 and cast only the
        # result.  XLA fuses the upcast into the elementwise kernel
        # (registers, no f32 memory pass).  A folded x*a + d form is NOT
        # safe here: for a near-constant input var ~ 0 makes
        # inv ~ 1/sqrt(eps) ~ 316, so x*a and d are O(hundreds) that
        # cancel to O(1) -- below bf16's absolute resolution at that
        # magnitude, which zeroed a whole U-Net level's forward (and
        # with it every upstream gradient).
        return ((x.astype(stat_dt) - mean) * inv
                * scale.astype(stat_dt)
                + bias.astype(stat_dt)).astype(x.dtype)


class BNConv(nn.Module):
    """BatchNorm -> Conv1d (the reference's ``conv1``/``conv2`` Sequentials,
    model_snv.py:144-147,156-160), optional trailing ReLU (``conv3``)."""
    features: int
    kernel_size: int
    relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchBatchNorm(name="bn")(x, not train)
        x = nn.Conv(self.features, kernel_size=(self.kernel_size,),
                    padding=[((self.kernel_size - 1) // 2,) * 2],
                    name="conv")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class _FusedBN(nn.Module):
    """Param/variable twin of :class:`TorchBatchNorm` for the fused
    training stem: identical names, shapes, init and running-stat update
    rule, but the batch statistics arrive precomputed (from the code
    histogram, :func:`mural_tpu.ops.fused_train_stem.hist_batch_stats`)
    instead of being reduced from activations.  Checkpoints are
    interchangeable with the unfused path."""
    features: int = 4
    momentum: float = 0.1

    @nn.compact
    def __call__(self, mean, var_biased, var_unbiased, train: bool):
        feat = self.features
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if train:
            use_mean, use_var = mean, var_biased
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var_unbiased
        else:
            use_mean, use_var = ra_mean.value, ra_var.value
        return scale, bias, use_mean, use_var


class _FusedConvParams(nn.Module):
    """Param twin of ``nn.Conv`` (same names/shapes/init) for the fused
    stem, which consumes the weights through the lookup table instead of
    calling the conv."""
    features: int
    kernel_size: int
    in_features: int = 4

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class FusedStemConvPool(nn.Module):
    """BN -> Conv1d -> MaxPool1d on raw uint8 genome codes in one fused
    Pallas op (ops/fused_train_stem.code_conv_pool).

    Drop-in replacement for ``BNConv(name='conv1') -> max_pool1d`` at
    the head of a distal tower (ref model_snv.py:144-150 wiring): the
    parameter/variable tree is identical, training-mode BN statistics
    are histogram-exact, running stats follow the same momentum rule,
    and parameter gradients are mathematically the composition's (the
    statistics carry no parameter dependence -- module docstring of
    ops/fused_train_stem).  The (B, L, C) conv activation never touches
    HBM.
    """
    features: int
    kernel_size: int
    pool: Sequence[int]          # (kernel, stride, pad), stride == kernel

    @nn.compact
    def __call__(self, codes, train: bool):
        from mural_tpu.ops.fused_code_conv import fold_bn_conv_table
        from mural_tpu.ops.fused_train_stem import (code_conv_pool,
                                                    hist_batch_stats)
        pk, ps, pp = self.pool
        if ps != pk:
            raise ValueError("fused stem requires pool stride == kernel")
        if train:
            mean, var_b, var_u = hist_batch_stats(codes)
        else:
            z = jnp.zeros((4,), jnp.float32)
            mean = var_b = var_u = z
        scale, bias_bn, use_mean, use_var = _FusedBN(name="bn")(
            mean, var_b, var_u, train)
        kernel, bias_c = _FusedConvParams(
            self.features, self.kernel_size, name="conv")()
        act_dtype = kernel.dtype     # params arrive pre-cast under bf16
        f32 = jnp.float32
        table, bias = fold_bn_conv_table(
            kernel.astype(f32), bias_c.astype(f32), scale.astype(f32),
            bias_bn.astype(f32), jax.lax.stop_gradient(use_mean),
            jax.lax.stop_gradient(use_var))
        # f32 training: hi+lo bf16 matmul pairs (f32-accurate); bf16
        # training: single bf16 passes -- the unfused path's rounding
        out = code_conv_pool(codes, table, bias, pk, pp,
                             split=(act_dtype == jnp.float32))
        return out.astype(act_dtype)


class ResBlock(nn.Module):
    """Pre-activation residual block (model_snv.py:794-812):
    ReLU->BN->Conv->ReLU->BN->Conv, residual cropped to the conv output
    length.  With padding (k-1)//2 lengths are preserved."""
    channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        p = (self.kernel_size - 1) // 2
        out = nn.relu(x)
        out = TorchBatchNorm(name="bn1")(out, not train)
        out = nn.Conv(self.channels, (self.kernel_size,),
                      padding=[(p, p)], name="conv1")(out)
        out = nn.relu(out)
        out = TorchBatchNorm(name="bn2")(out, not train)
        out = nn.Conv(self.channels, (self.kernel_size,),
                      padding=[(p, p)], name="conv2")(out)
        return x[:, :out.shape[1], :] + out


class DistalFC(nn.Module):
    """BN -> Dropout -> Linear head (model_snv.py:176-182)."""
    n_class: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchBatchNorm(name="bn")(x, not train)
        x = nn.Dropout(self.dropout, deterministic=not train,
                       name="drop")(x)
        return nn.Dense(self.n_class, name="fc")(x)


class ResNetTower(nn.Module):
    """One distal tower (model_snv.py:144-182 wiring / forward :240-258):

    BN-Conv -> maxpool(p1) -> 2xResBlock + skip -> maxpool(p2) -> BN-Conv
    -> 2xResBlock + skip -> maxpool(p3) -> BN-Conv-ReLU -> global max.
    ``pools`` selects the scale: (3,3,1)x3 for the mid-scale tower,
    (15,15,7),(7,7,3),(3,3,1) for the large-scale tower (:192-207).
    """
    out_channels: int
    kernel_size: int
    pools: Sequence[Sequence[int]]  # three (kernel, stride, pad) triples

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        if x.ndim == 2:
            # raw uint8 codes: fused one-hot+BN+conv+pool training stem
            # (identical param tree; see FusedStemConvPool)
            x = FusedStemConvPool(self.out_channels, k, self.pools[0],
                                  name="conv1")(x, train)
        else:
            x = BNConv(self.out_channels, k, name="conv1")(x, train)
            x = max_pool1d(x, *self.pools[0])
        jump = x
        x = ResBlock(self.out_channels, name="RBs1_0")(x, train)
        x = ResBlock(self.out_channels, name="RBs1_1")(x, train)
        x = jump[:, :x.shape[1], :] + x
        x = max_pool1d(x, *self.pools[1])
        x = BNConv(self.out_channels, k, name="conv2")(x, train)
        jump = x
        x = ResBlock(self.out_channels, name="RBs2_0")(x, train)
        x = ResBlock(self.out_channels, name="RBs2_1")(x, train)
        x = jump[:, :x.shape[1], :] + x
        x = max_pool1d(x, *self.pools[2])
        x = BNConv(self.out_channels, k, relu=True, name="conv3")(x, train)
        return global_max_1d(x)


MID_POOLS = ((3, 3, 1), (3, 3, 1), (3, 3, 1))
LARGE_POOLS = ((15, 15, 7), (7, 7, 3), (3, 3, 1))
