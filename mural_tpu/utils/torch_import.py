"""Import torch state_dict checkpoints into Flax parameter trees.

The reference ships per-species best models as torch state_dicts
(``models/<species>/<SNV|INDEL>/model``, SURVEY.md section 2.1) and its
``transfer``/``predict`` commands rehydrate them.  This module makes those
checkpoints loadable here:

- :func:`load_torch_state_dict` reads a torch zip-format checkpoint into
  {name: numpy array}, via torch when available, else with a pure-Python
  zip+pickle reader (no torch needed at runtime).
- :func:`flax_from_torch` maps the reference's module names
  (model_snv.py / model_indel.py) onto our Flax tree and transposes
  conv/linear kernels.

The reference's ResBlock registers its submodules twice (directly and
inside a ``layer`` Sequential, model_snv.py:798-804), so state_dicts
contain duplicate ``*.layer.N.*`` keys -- those are ignored.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Dict, Tuple

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


def _load_with_torch(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


class _TensorStub:
    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def to_numpy(self) -> np.ndarray:
        dtype, raw = self.storage
        arr = np.frombuffer(raw, dtype=dtype)
        return np.lib.stride_tricks.as_strided(
            arr[self.offset:],
            shape=self.size,
            strides=[s * arr.itemsize for s in self.stride]).copy()


def _load_pure_python(path: str) -> Dict[str, np.ndarray]:
    """Minimal reader for the torch zip serialization format: the pickle
    at ``*/data.pkl`` references storages by persistent id; raw bytes
    live at ``*/data/<key>``."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist()
                        if n.endswith("data.pkl"))
        prefix = pkl_name[:-len("data.pkl")]
        raw_pkl = zf.read(pkl_name)

        storages: Dict[str, Tuple] = {}

        class U(pickle.Unpickler):
            def find_class(self, module, name):
                if name == "_rebuild_tensor_v2":
                    def rebuild(storage, offset, size, stride,
                                requires_grad=None, hooks=None,
                                metadata=None):
                        return _TensorStub(storage, offset, size, stride)
                    return rebuild
                if name in _STORAGE_DTYPES:
                    return name          # marker string
                if name == "OrderedDict":
                    import collections
                    return collections.OrderedDict
                if name == "_rebuild_parameter":
                    return lambda data, requires_grad, hooks: data
                return lambda *a, **k: None

            def persistent_load(self, pid):
                assert pid[0] == "storage"
                storage_type, key = pid[1], pid[2]
                if key not in storages:
                    raw = zf.read(f"{prefix}data/{key}")
                    dtype = _STORAGE_DTYPES.get(storage_type)
                    if dtype is None and storage_type == "BFloat16Storage":
                        # upcast bf16 -> f32 via uint16 bit manipulation
                        u = np.frombuffer(raw, dtype=np.uint16)
                        f = (u.astype(np.uint32) << 16).view(np.float32)
                        storages[key] = (np.float32, f.tobytes())
                    else:
                        storages[key] = (dtype, raw)
                return storages[key]

        obj = U(io.BytesIO(raw_pkl)).load()
        return {k: v.to_numpy() for k, v in obj.items()
                if isinstance(v, _TensorStub)}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    try:
        return _load_with_torch(path)
    except ImportError:
        return _load_pure_python(path)


# ---------------------------------------------------------------------------
# name mapping: our flax path -> reference torch key prefix
# ---------------------------------------------------------------------------

def _torch_prefix(keys) -> str:
    """Map a Flax module path (without the leaf name) to the torch module
    prefix in the reference state_dict."""
    k = list(keys)

    # SNVNet0 wrapper: model/<...>
    wrap = ""
    if k and k[0] == "model":
        wrap = "model."
        k = k[1:]

    if not k:
        raise KeyError("empty path")

    head = k[0]
    if head == "local":
        sub = k[1]
        if sub == "emb_layer":
            return wrap + "emb_layer"
        if sub.startswith("lin_"):
            return wrap + f"lin_layers.{sub[4:]}"
        if sub.startswith("bn_"):
            return wrap + f"bn_layers.{sub[3:]}"
        if sub == "first_bn":
            return wrap + "first_bn_layer"
        raise KeyError(keys)
    if head == "local_fc":
        return wrap + "local_fc.0"
    if head == "output_layer":
        return wrap + "output_layer"
    if head == "local_fc2_bn":
        return "local_fc2.0"
    if head == "local_fc2":
        return "local_fc2.2"

    if head == "towers":
        tower = k[1]
        suffix = "_2" if tower == "tower2" else ""
        if tower.startswith("distal_fc"):
            idx = {"bn": 0, "fc": 2}[k[2]]
            return f"{tower}.{idx}"
        sub = k[2]
        if sub in ("conv1", "conv2", "conv3"):
            idx = {"bn": 0, "conv": 1}[k[3]]
            return f"{sub}{suffix}.{idx}"
        if sub.startswith("RBs"):
            group, j = sub.split("_")          # RBs1_0 -> RBs1, 0
            return f"{group}{suffix}.{j}.{k[3]}"
        raise KeyError(keys)

    # ---- INDEL UNet ----
    if head == "stem_conv":
        return "conv.0"
    if head == "stem_bn":
        return "conv.1"
    if head.startswith("uplblock_"):
        return f"uplblocks.{head[9:]}.0"
    if head.startswith("uplbn_"):
        return f"uplblocks.{head[6:]}.1"
    if head.startswith("downlblock_"):
        return f"downlblocks.{head[11:]}.1"
    if head.startswith("downlbn_"):
        return f"downlblocks.{head[8:]}.2"
    if head.startswith("upblock_") or head.startswith("downblock_"):
        if head.startswith("upblock_"):
            base = f"upblocks.{head[8:]}.0.conv"
        else:
            base = f"downblocks.{head[10:]}.0.conv"
        idx = {"conv_expand": 0, "bn1": 1, "conv_project": 3,
               "bn2": 4}[k[1]]
        return f"{base}.{idx}"
    if head == "out_conv1":
        return "out_conv.0"
    if head == "out_bn":
        return "out_conv.1"
    if head == "out_conv2":
        return "out_conv.3"
    if head == "out_fc_bn":
        return "out_fc.0"
    if head == "out_fc":
        return "out_fc.2"
    raise KeyError(keys)


def _leaf_from_torch(name: str, leaf, sd: Dict[str, np.ndarray],
                     prefix: str):
    if name == "kernel":
        w = sd[prefix + ".weight"]
        if np.ndim(leaf) == 3:      # conv: torch (out,in,k) -> (k,in,out)
            return np.ascontiguousarray(w.transpose(2, 1, 0))
        return np.ascontiguousarray(w.T)
    if name == "embedding":
        return sd[prefix + ".weight"]
    if name == "scale":
        return sd[prefix + ".weight"]
    if name == "bias":
        return sd[prefix + ".bias"]
    if name == "mean":
        return sd[prefix + ".running_mean"]
    if name == "var":
        return sd[prefix + ".running_var"]
    raise KeyError(name)


def flax_from_torch(sd: Dict[str, np.ndarray], template: Dict) -> Dict:
    """Fill a {params, batch_stats} template from a reference torch
    state_dict.  Raises KeyError listing any unmapped template leaf."""
    import jax

    out = {}
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(
            template.get(coll, {}))
        leaves = []
        for path, leaf in flat[0]:
            keys = [p.key for p in path]
            prefix = _torch_prefix(keys[:-1])
            arr = _leaf_from_torch(keys[-1], leaf, sd, prefix)
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for {'.'.join(keys)}: torch "
                    f"{arr.shape} vs flax {np.shape(leaf)}")
            import jax.numpy as jnp
            leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
        out[coll] = jax.tree_util.tree_unflatten(flat[1], leaves)
    return out


def load_torch_checkpoint(path: str, template: Dict) -> Dict:
    return flax_from_torch(load_torch_state_dict(path), template)
