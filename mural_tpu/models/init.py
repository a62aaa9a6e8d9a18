"""torch-parity weight initialisation.

The reference applies ``weights_init`` to every module
(MuRaL/model/nn_utils.py:14-35): Conv1d -> xavier_uniform, Linear ->
kaiming_normal (torch defaults: fan_in, gain sqrt(2)), biases -> 0.
Flax kernels for Conv are (k, in, out) and Dense (in, out); torch fans:

- Conv1d weight (out, in, k): fan_in = in*k, fan_out = out*k
- Linear weight (out, in):    fan_in = in,   fan_out = out
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def materialize_variables(template, seed: int = 0):
    """Build {params, batch_stats} arrays directly from a shape template
    (``jax.eval_shape`` of ``model.init``) with the reference's init
    scheme -- zero compilation needed, unlike running ``model.init``:

    - conv kernels: xavier_uniform; dense kernels: kaiming_normal
      (ref ``weights_init``, nn_utils.py:14-35); biases zero
    - embeddings: N(0, 1) (torch nn.Embedding default; the reference
      never re-initialises ``emb_layer``)
    - BatchNorm scale 1 / bias 0; running mean 0 / var 1
    """
    rng = np.random.default_rng(seed)
    out = {}
    for coll, tree in template.items():
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in flat:
            name = path[-1].key if hasattr(path[-1], "key") else \
                str(path[-1])
            shape, dtype = tuple(leaf.shape), leaf.dtype
            if name in ("bias", "mean"):
                arr = np.zeros(shape)
            elif name in ("scale", "var"):
                arr = np.ones(shape)
            elif name == "embedding":
                arr = rng.normal(0.0, 1.0, size=shape)
            elif name == "kernel" and len(shape) == 3:
                k, fin, fout = shape
                a = math.sqrt(6.0 / (fin * k + fout * k))
                arr = rng.uniform(-a, a, size=shape)
            elif name == "kernel" and len(shape) == 2:
                arr = rng.normal(0.0, math.sqrt(2.0 / shape[0]),
                                 size=shape)
            else:
                raise ValueError(f"unknown param leaf {name}")
            leaves.append(jnp.asarray(arr, dtype=dtype))
        out[coll] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out


def torch_style_init(params, seed: int = 0, emb_normal: bool = True):
    """Re-initialise a Flax param tree with the reference's scheme.

    Embeddings keep torch's nn.Embedding default N(0, 1) (the reference
    never re-initialises ``emb_layer`` because weights_init only matches
    Conv/Linear class names).  BatchNorm scales/biases stay (1, 0).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    rng = np.random.default_rng(seed)
    out = []
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = np.asarray(leaf)
        if name == "bias":
            arr = np.zeros_like(arr)
        elif name == "embedding":
            if emb_normal:
                arr = rng.normal(0.0, 1.0, size=arr.shape)
        elif name == "kernel" and arr.ndim == 3:
            # conv (k, in, out): xavier uniform
            k, fin, fout = arr.shape
            a = math.sqrt(6.0 / (fin * k + fout * k))
            arr = rng.uniform(-a, a, size=arr.shape)
        elif name == "kernel" and arr.ndim == 2:
            # dense (in, out): kaiming normal, fan_in = in
            fin = arr.shape[0]
            std = math.sqrt(2.0 / fin)
            arr = rng.normal(0.0, std, size=arr.shape)
        out.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
