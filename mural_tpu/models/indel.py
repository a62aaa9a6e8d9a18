"""INDEL 1-D U-Net (Flax re-design of MuRaL/model/model_indel.py).

Six encoder levels with strides ``downsize[i]`` and channel widths
``out_channels * (i+1)``; each level is a strided BN-Conv followed by a
residual inverted-bottleneck ``ConvBlock`` (5-wide expand-2 with SiLU,
model_indel.py:6-19).  The decoder mirrors with nearest-neighbour
upsampling + conv + ConvBlock and additive skip connections
(:86-134,165-170).  Head: two 1x1 convs with Softplus, global max over
length, BN -> Dropout(0.1) -> Linear -> Softplus (:136-149,172-174).

``use_reverse`` adds the strand-symmetrised stem
``conv(x) + flip(conv(flip(x)))`` (:29-32,154-155); for a one-hot ACGT
input, flipping the channel axis IS complementation, so the stem makes
insertion models reverse-complement equivariant.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mural_tpu.models.layers import (TorchBatchNorm, global_max_1d,
                                      upsample_nearest)


class ConvBlock(nn.Module):
    """Residual inverted bottleneck (model_indel.py:6-19):
    Conv(k=5, pad=2, expand 2x, no bias) -> BN -> SiLU -> Conv(1x1, no
    bias) -> BN, added to the input."""
    channels: int
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        hidden = round(self.channels * self.expand_ratio)
        h = nn.Conv(hidden, (5,), padding=[(2, 2)], use_bias=False,
                    name="conv_expand")(x)
        h = TorchBatchNorm(name="bn1")(h, not train)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (1,), use_bias=False,
                    name="conv_project")(h)
        h = TorchBatchNorm(name="bn2")(h, not train)
        return x + h


class UNetSmall(nn.Module):
    """The INDEL model (ref UNet_Small, model_indel.py:21-179).

    Input: distal one-hot (N, L, 4) with L = 2 * distal_radius; output:
    softplus'd (N, n_class) scores used as logits by the CE loss.
    """
    n_class: int
    out_channels: int
    kernel_size: int
    downsize: Sequence[int]          # e.g. (1, 4, 5, 5, 5, 2)
    use_reverse: bool = False

    @nn.compact
    def __call__(self, cat_x=None, cont_x=None, distal=None,
                 train: bool = False):
        stride = 1
        for s in self.downsize:
            stride *= s
        W = distal.shape[-2]
        if W % stride:
            # fail fast with flag names instead of the XLA broadcast
            # error the misaligned skip-additions otherwise produce
            # (the reference torch model crashes just as opaquely,
            # model_indel.py:165-170)
            raise ValueError(
                f"INDEL U-Net geometry: window length {W} "
                f"(= 2*distal_radius) is not a multiple of the "
                f"cumulative --down_list stride {stride} "
                f"(down_list={list(self.downsize)}), so the decoder's "
                "skip connections cannot align. Choose --distal_radius "
                f"such that 2*radius is a multiple of {stride} "
                "(reference recipes: 4000, 2000) or adjust --down_list.")
        out = distal
        k = self.kernel_size
        p = (k - 1) // 2

        if self.use_reverse:
            stem_conv = nn.Conv(4, (k,), padding=[(p, p)], name="stem_conv")
            stem_bn = TorchBatchNorm(name="stem_bn")
            fwd = stem_bn(stem_conv(out), not train)
            # flip length AND channel axes == reverse complement for the
            # ACGT one-hot ordering (model_indel.py:155,178)
            rev = stem_bn(stem_conv(out[:, ::-1, ::-1]), not train)[:, ::-1, :]
            out = fwd + rev

        channels = [self.out_channels * (i + 1) for i in range(6)]

        encodings = []
        for i in range(6):
            out = nn.Conv(channels[i], (k,), strides=(self.downsize[i],),
                          padding=[(p, p)], name=f"uplblock_{i}")(out)
            out = TorchBatchNorm(name=f"uplbn_{i}")(out, not train)
            out = ConvBlock(channels[i], name=f"upblock_{i}")(out, train)
            encodings.append(out)

        for j in range(5):
            level = 4 - j                      # target encoder level
            out = upsample_nearest(out, self.downsize[level + 1])
            out = nn.Conv(channels[level], (k,), padding=[(p, p)],
                          name=f"downlblock_{j}")(out)
            out = TorchBatchNorm(name=f"downlbn_{j}")(out, not train)
            out = ConvBlock(channels[level], name=f"downblock_{j}")(out, train)
            out = encodings[level] + out

        out = nn.Conv(channels[0], (1,), name="out_conv1")(out)
        out = TorchBatchNorm(name="out_bn")(out, not train)
        out = nn.relu(out)
        out = nn.Conv(channels[0], (1,), name="out_conv2")(out)
        out = jax.nn.softplus(out)
        out = global_max_1d(out)
        out = TorchBatchNorm(name="out_fc_bn")(out, not train)
        out = nn.Dropout(0.1, deterministic=not train, name="out_fc_drop")(out)
        out = nn.Dense(self.n_class, name="out_fc")(out)
        return jax.nn.softplus(out)
