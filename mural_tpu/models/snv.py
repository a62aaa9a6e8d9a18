"""SNV network family (Flax re-design of MuRaL/model/model_snv.py).

Four models, numbered as the reference's ``--model_no``:

- ``SNVNet0``: local-only feed-forward net over k-mer embeddings
  (ref FeedForwardNN/Network0, model_snv.py:19-108).
- ``SNVNet1``: expanded-only dual-scale ResNet towers
  (ref Network1, :111-287).
- ``SNVNet2``: local branch + both towers, probability-space averaged
  (ref Network2, :290-525).  The flagship model.
- ``SNVNet3``: SNVNet2 + separate head for continuous (bigWig) features,
  three-way average (ref Network3, :527-790).

Inputs are channels-last: ``cat_x (N, K) int``, ``cont_x (N, n_cont)``,
``distal (N, L, C) float`` (one-hot from
:func:`mural_tpu.models.layers.one_hot_from_codes` plus optional track
channels).  Outputs are log-probabilities ``log(clamp(mean(probs), 1e-9))``
exactly as the reference, to be consumed by a softmax-cross-entropy loss.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mural_tpu.models.layers import (LARGE_POOLS, MID_POOLS, DistalFC,
                                     OneHotEmbed, ResNetTower,
                                     TorchBatchNorm)

_EPS = 1e-9


class LocalBranch(nn.Module):
    """Shared k-mer embedding + FC trunk (ref model_snv.py:44-61,74-91).

    Every categorical column shares one ``(4**k + 1, 5)`` embedding table;
    column embeddings are concatenated, passed through
    ReLU(Linear)->BN->Dropout blocks.
    """
    emb_vocab: int            # emb_padding_idx + 1 == 4**local_order + 1
    n_cat: int
    lin_layer_sizes: Sequence[int]
    emb_dropout: float
    lin_layer_dropouts: Sequence[float]
    n_cont: int = 0
    use_cont: bool = False    # Network0/2 concat cont after first BN

    @nn.compact
    def __call__(self, cat_x, cont_x, train: bool):
        emb = OneHotEmbed(self.emb_vocab, 5, name="emb_layer")(cat_x)
        local = emb.reshape(emb.shape[0], self.n_cat * 5)
        local = nn.Dropout(self.emb_dropout, deterministic=not train,
                           name="emb_dropout")(local)
        if self.use_cont and self.n_cont > 0:
            cont = TorchBatchNorm(name="first_bn")(cont_x, not train)
            local = jnp.concatenate([local, cont], axis=1)
        for i, (size, drop) in enumerate(
                zip(self.lin_layer_sizes, self.lin_layer_dropouts)):
            local = nn.relu(nn.Dense(size, name=f"lin_{i}")(local))
            local = TorchBatchNorm(name=f"bn_{i}")(local, not train)
            local = nn.Dropout(drop, deterministic=not train,
                               name=f"drop_{i}")(local)
        return local


class FeedForwardNN(nn.Module):
    """Local-only net (ref FeedForwardNN, model_snv.py:19-95)."""
    emb_vocab: int
    n_cat: int
    lin_layer_sizes: Sequence[int]
    emb_dropout: float
    lin_layer_dropouts: Sequence[float]
    n_class: int
    n_cont: int = 0

    @nn.compact
    def __call__(self, cat_x, cont_x=None, train: bool = False):
        local = LocalBranch(self.emb_vocab, self.n_cat, self.lin_layer_sizes,
                            self.emb_dropout, self.lin_layer_dropouts,
                            n_cont=self.n_cont, use_cont=True,
                            name="local")(cat_x, cont_x, train)
        return nn.Dense(self.n_class, name="output_layer")(local)


class SNVNet0(nn.Module):
    """Wrapper matching Network0's (local, distal) call signature."""
    emb_vocab: int
    n_cat: int
    lin_layer_sizes: Sequence[int]
    emb_dropout: float
    lin_layer_dropouts: Sequence[float]
    n_class: int
    n_cont: int = 0

    @nn.compact
    def __call__(self, cat_x, cont_x=None, distal=None, train: bool = False):
        return FeedForwardNN(self.emb_vocab, self.n_cat, self.lin_layer_sizes,
                             self.emb_dropout, self.lin_layer_dropouts,
                             self.n_class, self.n_cont,
                             name="model")(cat_x, cont_x, train)


class DualTowers(nn.Module):
    """The two distal ResNet towers + their FC heads (ref model_snv.py:
    349-430 construction, :470-513 forward).  Tower 1 sees a +-100bp
    center crop; tower 2 the full window with aggressive pooling."""
    in_channels: int
    out_channels: int
    kernel_size: int
    distal_fc_dropout: float
    n_class: int

    @nn.compact
    def __call__(self, distal, train: bool):
        L = distal.shape[1]
        if distal.ndim == 2:
            # raw uint8 codes -> each tower's first BN+conv+pool runs as
            # the fused table kernel (layers.FusedStemConvPool); only
            # valid without extra track channels
            if self.in_channels != 4:
                raise ValueError(
                    "codes input requires in_channels == 4 (no distal "
                    f"track channels), got {self.in_channels}")
            x = distal
            crop = distal[:, L // 2 - 100: L // 2 + 100 + 1]
        else:
            x = distal[:, :, :self.in_channels]
            crop = x[:, L // 2 - 100: L // 2 + 100 + 1, :]
        d1 = ResNetTower(self.out_channels, self.kernel_size, MID_POOLS,
                         name="tower1")(crop, train)
        d1 = DistalFC(self.n_class, self.distal_fc_dropout,
                      name="distal_fc1")(d1, train)
        d2 = ResNetTower(self.out_channels, self.kernel_size, LARGE_POOLS,
                         name="tower2")(x, train)
        d2 = DistalFC(self.n_class, self.distal_fc_dropout,
                      name="distal_fc2")(d2, train)
        return d1, d2


class SNVNet1(nn.Module):
    """Expanded-only model (ref Network1, model_snv.py:111-287)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    distal_fc_dropout: float
    n_class: int

    @nn.compact
    def __call__(self, cat_x=None, cont_x=None, distal=None,
                 train: bool = False):
        d1, d2 = DualTowers(self.in_channels, self.out_channels,
                            self.kernel_size, self.distal_fc_dropout,
                            self.n_class, name="towers")(distal, train)
        probs = (nn.softmax(d1, axis=1) + nn.softmax(d2, axis=1)) / 2
        return jnp.log(jnp.clip(probs, _EPS))


class SNVNet2(nn.Module):
    """Combined local + dual-tower model (ref Network2, model_snv.py:
    290-525); probabilities averaged as
    log(clamp((local + (d1+d2)/2) / 2, 1e-9)) (:515-523)."""
    emb_vocab: int
    n_cat: int
    lin_layer_sizes: Sequence[int]
    emb_dropout: float
    lin_layer_dropouts: Sequence[float]
    in_channels: int
    out_channels: int
    kernel_size: int
    distal_fc_dropout: float
    n_class: int
    n_cont: int = 0

    @nn.compact
    def __call__(self, cat_x, cont_x=None, distal=None, train: bool = False):
        local = LocalBranch(self.emb_vocab, self.n_cat, self.lin_layer_sizes,
                            self.emb_dropout, self.lin_layer_dropouts,
                            n_cont=self.n_cont, use_cont=True,
                            name="local")(cat_x, cont_x, train)
        local = nn.Dense(self.n_class, name="local_fc")(local)
        d1, d2 = DualTowers(self.in_channels, self.out_channels,
                            self.kernel_size, self.distal_fc_dropout,
                            self.n_class, name="towers")(distal, train)
        distal_p = (nn.softmax(d1, axis=1) + nn.softmax(d2, axis=1)) / 2
        local_p = nn.softmax(local, axis=1)
        return jnp.log(jnp.clip((local_p + distal_p) / 2, _EPS))


class SNVNet3(nn.Module):
    """SNVNet2 + separate continuous-feature head (ref Network3,
    model_snv.py:527-790): cont features bypass the k-mer trunk and get
    their own BN->Dropout->Linear head; outputs are a three-way average."""
    emb_vocab: int
    n_cat: int
    lin_layer_sizes: Sequence[int]
    emb_dropout: float
    lin_layer_dropouts: Sequence[float]
    in_channels: int
    out_channels: int
    kernel_size: int
    distal_fc_dropout: float
    n_class: int
    n_cont: int = 0

    @nn.compact
    def __call__(self, cat_x, cont_x=None, distal=None, train: bool = False):
        local = LocalBranch(self.emb_vocab, self.n_cat, self.lin_layer_sizes,
                            self.emb_dropout, self.lin_layer_dropouts,
                            n_cont=0, use_cont=False,
                            name="local")(cat_x, cont_x, train)
        local = nn.Dense(self.n_class, name="local_fc")(local)
        d1, d2 = DualTowers(self.in_channels, self.out_channels,
                            self.kernel_size, self.distal_fc_dropout,
                            self.n_class, name="towers")(distal, train)
        distal_p = (nn.softmax(d1, axis=1) + nn.softmax(d2, axis=1)) / 2
        local_p = nn.softmax(local, axis=1)
        if self.n_cont > 0:
            l2 = TorchBatchNorm(name="local_fc2_bn")(cont_x, not train)
            l2 = nn.Dropout(self.lin_layer_dropouts[0],
                            deterministic=not train,
                            name="local_fc2_drop")(l2)
            l2 = nn.Dense(self.n_class, name="local_fc2")(l2)
            l2_p = nn.softmax(l2, axis=1)
            return jnp.log(jnp.clip((local_p + distal_p + l2_p) / 3, _EPS))
        return jnp.log(jnp.clip((local_p + distal_p) / 2, _EPS))
