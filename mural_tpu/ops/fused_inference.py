"""BN-folded fused inference forward for SNVNet2.

Eval-mode BatchNorm is a per-channel affine, so every BN in the network
folds into the adjacent conv/dense:

- ``BN -> Conv``:  W'[k,c,o] = W[k,c,o] * a_c,  b'_o = b_o + sum_kc W*d_c
- ``BN -> Dense``: W'[c,o]  = W[c,o] * a_c,     b'_o = b_o + sum_c  W*d_c
- the input stems additionally fold the one-hot into a per-tap lookup
  table executed by the Pallas kernel (:mod:`fused_code_conv`).

with a = gamma / sqrt(var + eps) and d = beta - mean * a.  The result is
an inference program with no normalisation ops at all: embeddings,
convs, maxpools, ReLUs, dense heads, softmax.  Numerically equivalent to
``model.apply(..., train=False)`` (tests/test_fused_inference.py).

Enabled with ``--fused_inference`` on ``predict`` (SNV model_no 2).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mural_tpu.models.layers import LARGE_POOLS, MID_POOLS, max_pool1d
from mural_tpu.ops.fused_code_conv import code_conv1d, fold_bn_conv_table

_EPS_BN = 1e-5
_EPS = 1e-9


def _affine(bn_params: Dict, bn_stats: Dict):
    a = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + _EPS_BN)
    d = bn_params["bias"] - bn_stats["mean"] * a
    return a, d


def _fold_conv(conv: Dict, bn_params: Dict, bn_stats: Dict):
    """BN -> Conv fold; conv kernel (k, cin, cout).

    Zero padding happens AFTER the BN in the reference, so the folded
    d-term is position-dependent near the edges (padded taps contribute
    0, not W*d).  The raw kernel and d are kept so the forward can add
    the exact per-position d-term via a constant convolution."""
    a, d = _affine(bn_params, bn_stats)
    return {"kernel": conv["kernel"] * a[None, :, None],
            "bias": conv["bias"], "raw": conv["kernel"], "d": d}

def _fold_dense(dense: Dict, bn_params: Dict, bn_stats: Dict):
    """BN -> Dense fold; dense kernel (cin, cout)."""
    a, d = _affine(bn_params, bn_stats)
    kernel = dense["kernel"] * a[:, None]
    bias = dense["bias"] + d @ dense["kernel"]
    return kernel, bias


def _conv1d(x, kernel, bias, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHC", "HIO", "NHC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=dn) + bias


def _conv1d_folded(x, fc: Dict, pad):
    out = _conv1d(x, fc["kernel"], fc["bias"], pad)
    # exact BN d-term incl. edge effects: convolve a constant d map with
    # the raw kernel under the same zero padding (XLA constant-folds it)
    ones_d = jnp.ones((1, x.shape[1], 1), x.dtype) * fc["d"][None, None, :]
    dterm = _conv1d(ones_d, fc["raw"], jnp.zeros((), x.dtype), pad)
    return out + dterm


def fold_snv2(variables: Dict, config: Dict) -> Dict:
    """Pre-fold all SNVNet2 parameters for inference."""
    p, s = variables["params"], variables["batch_stats"]
    folded = {"local": {}, "towers": {}}

    lp, ls = p["local"], s["local"]
    folded["local"]["emb"] = lp["emb_layer"]["embedding"]
    # lin_i -> relu -> bn_i -> (next): fold bn_i into the NEXT dense
    n_lin = sum(1 for k in lp if k.startswith("lin_"))
    folded["local"]["lin_0"] = (lp["lin_0"]["kernel"],
                                lp["lin_0"]["bias"])
    for i in range(1, n_lin):
        folded["local"][f"lin_{i}"] = _fold_dense(
            lp[f"lin_{i}"], lp[f"bn_{i-1}"], ls[f"bn_{i-1}"])
    folded["local_fc"] = _fold_dense(
        p["local_fc"], lp[f"bn_{n_lin-1}"], ls[f"bn_{n_lin-1}"])

    k = config["CNN_kernel_size"]
    for tower in ("tower1", "tower2"):
        tp, ts = p["towers"][tower], s["towers"][tower]
        ft = {}
        ft["stem"] = fold_bn_conv_table(
            tp["conv1"]["conv"]["kernel"], tp["conv1"]["conv"]["bias"],
            tp["conv1"]["bn"]["scale"], tp["conv1"]["bn"]["bias"],
            ts["conv1"]["bn"]["mean"], ts["conv1"]["bn"]["var"])
        for name in ("conv2", "conv3"):
            ft[name] = _fold_conv(tp[name]["conv"], tp[name]["bn"],
                                  ts[name]["bn"])
        for rb in ("RBs1_0", "RBs1_1", "RBs2_0", "RBs2_1"):
            ft[rb] = {
                "c1": _fold_conv(tp[rb]["conv1"], tp[rb]["bn1"],
                                 ts[rb]["bn1"]),
                "c2": _fold_conv(tp[rb]["conv2"], tp[rb]["bn2"],
                                 ts[rb]["bn2"]),
            }
        folded["towers"][tower] = ft
    for fc in ("distal_fc1", "distal_fc2"):
        folded[fc] = _fold_dense(p["towers"][fc]["fc"],
                                 p["towers"][fc]["bn"],
                                 s["towers"][fc]["bn"])
    return folded


def _resblock(x, rb, pad):
    out = jax.nn.relu(x)
    out = _conv1d_folded(out, rb["c1"], pad)
    out = jax.nn.relu(out)
    out = _conv1d_folded(out, rb["c2"], pad)
    return x[:, :out.shape[1], :] + out


def _tower(codes, ft, k, pools, interpret):
    pad = (k - 1) // 2
    rbp = 1   # ResBlock kernel 3
    table, bias = ft["stem"]
    x = code_conv1d(codes, table, bias, interpret=interpret)
    x = max_pool1d(x, *pools[0])
    jump = x
    x = _resblock(_resblock(x, ft["RBs1_0"], rbp), ft["RBs1_1"], rbp)
    x = jump[:, :x.shape[1], :] + x
    x = max_pool1d(x, *pools[1])
    x = _conv1d_folded(x, ft["conv2"], pad)
    jump = x
    x = _resblock(_resblock(x, ft["RBs2_0"], rbp), ft["RBs2_1"], rbp)
    x = jump[:, :x.shape[1], :] + x
    x = max_pool1d(x, *pools[2])
    x = jax.nn.relu(_conv1d_folded(x, ft["conv3"], pad))
    return jnp.max(x, axis=1)


@partial(jax.jit, static_argnames=("k", "interpret"))
def snv2_fused_forward(folded: Dict, cat, codes, k: int = 3,
                       interpret: bool = False):
    """Fused eval forward: (cat int32 (N,K), codes uint8 (N,L)) ->
    log-prob outputs identical to SNVNet2.apply(train=False).
    ``k`` is the (static) first-conv kernel size."""
    local = folded["local"]["emb"][cat].reshape(cat.shape[0], -1)
    i = 0
    while f"lin_{i}" in folded["local"]:
        kern, bias = folded["local"][f"lin_{i}"]
        local = jax.nn.relu(local @ kern + bias)
        i += 1
    kern, bias = folded["local_fc"]
    local = local @ kern + bias

    L = codes.shape[1]
    crop = codes[:, L // 2 - 100: L // 2 + 100 + 1]
    d1 = _tower(crop, folded["towers"]["tower1"], k, MID_POOLS, interpret)
    d2 = _tower(codes, folded["towers"]["tower2"], k, LARGE_POOLS,
                interpret)
    kern, bias = folded["distal_fc1"]
    d1 = d1 @ kern + bias
    kern, bias = folded["distal_fc2"]
    d2 = d2 @ kern + bias

    distal_p = (jax.nn.softmax(d1, axis=1)
                + jax.nn.softmax(d2, axis=1)) / 2
    local_p = jax.nn.softmax(local, axis=1)
    return jnp.log(jnp.clip((local_p + distal_p) / 2, _EPS))
