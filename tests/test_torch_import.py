"""Torch checkpoint import: the SHIPPED reference checkpoint
(examples/snv/models/checkpoint_6, a Network2 state_dict with
local_radius 7 / local_order 3 / distal_radius 200 / k3 / ch32) must load
into our Flax tree and produce the same eval-mode outputs as the torch
reference architecture with those weights."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.utils.torch_import import (_leaf_from_torch, _torch_prefix,
                                          flax_from_torch,
                                          load_torch_state_dict,
                                          _load_pure_python)

CKPT = "/root/reference/examples/snv/models/checkpoint_6"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "model")),
    reason="shipped reference checkpoint not available")


@pytest.fixture(scope="module")
def shipped():
    sd = load_torch_state_dict(os.path.join(CKPT, "model"))
    with open(os.path.join(CKPT, "model.config.pkl"), "rb") as fh:
        config = pickle.load(fh)
    return sd, config


@pytest.fixture(scope="module")
def flax_model_and_vars(shipped):
    from mural_tpu.predict.pipeline import build_model_from_config
    sd, config = shipped
    config = dict(config)
    config.setdefault("distal_order", 1)
    model = build_model_from_config(config, n_cont=0, model_type="snv")
    cat = jnp.zeros((2, 13), jnp.int32)
    distal = jnp.zeros((2, 401, 4), jnp.float32)
    template = model.init(jax.random.key(0), cat, None, distal, False)
    restored = flax_from_torch(sd, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {})})
    return model, restored


def test_state_dict_loads_and_covers_tree(shipped, flax_model_and_vars):
    sd, _ = shipped
    assert "emb_layer.weight" in sd
    assert sd["emb_layer.weight"].shape == (65, 5)
    model, restored = flax_model_and_vars
    # every leaf non-default (BN vars not all ones etc.)
    n_leaves = len(jax.tree.leaves(restored["params"]))
    assert n_leaves > 80


def test_pure_python_reader_matches_torch(shipped):
    sd_torch, _ = shipped
    sd_py = _load_pure_python(os.path.join(CKPT, "model"))
    assert set(sd_py) == set(sd_torch)
    for k in sd_torch:
        assert np.allclose(sd_py[k], sd_torch[k]), k


@pytest.mark.slow
def test_shipped_checkpoint_forward_parity(shipped, flax_model_and_vars):
    """Flax forward with imported weights == torch reference forward."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import TorchSNVNet2

    sd, config = shipped
    model, restored = flax_model_and_vars

    tmodel = TorchSNVNet2(65, 13, [150, 75], 4, 32, 3, 4)
    # load the REFERENCE state_dict into the clone by translating the
    # clone's attribute paths through the same name mapping used for flax
    new_sd = {}
    for name, _ in list(tmodel.named_parameters()) + \
            list(tmodel.named_buffers()):
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        leafname = parts[-1]
        prefix = _torch_prefix([p for p in parts[:-1]
                                if not p.isdigit()] if False else
                               _clone_to_flax(parts[:-1]))
        src = {"weight": ".weight", "bias": ".bias",
               "running_mean": ".running_mean",
               "running_var": ".running_var"}[leafname]
        new_sd[name] = torch.from_numpy(np.asarray(sd[prefix + src]))
    tmodel.load_state_dict(new_sd, strict=False)
    tmodel.eval()

    rng = np.random.default_rng(0)
    cat = rng.integers(0, 65, size=(6, 13))
    distal = rng.normal(size=(6, 401, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(cat),
                     torch.from_numpy(distal.transpose(0, 2, 1))).numpy()
    ours = np.asarray(model.apply(restored, jnp.asarray(cat), None,
                                  jnp.asarray(distal), False))
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


def _clone_to_flax(parts):
    """The torch clone's attribute path IS our flax path modulo the
    lin_{i}/bn_{i} naming, which already matches."""
    return parts


def test_load_checkpoint_autodetects_torch_format(flax_model_and_vars):
    from mural_tpu.train.checkpoint import load_checkpoint
    model, restored = flax_model_and_vars
    template = {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}
    out = load_checkpoint(os.path.join(CKPT, "model"), template)
    a = jax.tree.leaves(out["params"])[0]
    b = jax.tree.leaves(restored["params"])[0]
    assert np.allclose(np.asarray(a), np.asarray(b))
