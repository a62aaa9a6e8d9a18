"""Torch import of the SHIPPED INDEL checkpoint (examples/indel/models/
checkpoint_9: UNet, down_list 1,4,5,5,5,2, use_reverse, k7/ch8) and
forward parity vs the torch clone."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.train.checkpoint import load_config
from mural_tpu.utils.torch_import import (flax_from_torch,
                                          load_torch_state_dict)

CKPT = "/root/reference/examples/indel/models/checkpoint_9"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "model")),
    reason="shipped reference INDEL checkpoint not available")


def test_config_key_normalisation():
    config = load_config(os.path.join(CKPT, "model.config.pkl"))
    assert config["segment_center"] == 300000
    assert config["sampled_segments"] == 50
    assert config["use_reverse"] is True
    assert config["down_list"] == [1, 4, 5, 5, 5, 2]


@pytest.mark.slow
def test_shipped_indel_checkpoint_forward_parity():
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import TorchUNet, copy_flax_to_torch
    from mural_tpu.predict.pipeline import build_model_from_config

    config = load_config(os.path.join(CKPT, "model.config.pkl"))
    sd = load_torch_state_dict(os.path.join(CKPT, "model"))

    model = build_model_from_config(config, 0, "indel")
    Lw = 2 * config["distal_radius"]
    distal = jax.ShapeDtypeStruct((2, Lw, 4), jnp.float32)
    template = jax.eval_shape(
        lambda k, d: model.init(k, None, None, d, False),
        jax.ShapeDtypeStruct((2,), jnp.uint32), distal)
    restored = flax_from_torch(sd, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {})})

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, Lw, 4)).astype(np.float32)
    ours = np.asarray(model.apply(restored, None, None, jnp.asarray(x),
                                  False))
    assert ours.shape == (2, 8)
    assert (ours >= 0).all()       # softplus head

    # torch clone with the SAME shipped weights (clone paths == flax
    # paths, so copy flax->torch reuses the validated mapping)
    tmodel = TorchUNet(8, config["CNN_out_channels"],
                       config["CNN_kernel_size"],
                       tuple(config["down_list"]), True)
    copy_flax_to_torch(restored, tmodel)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    assert np.allclose(ours, ref, atol=5e-3), np.abs(ours - ref).max()


def test_shipped_indel_calibrator_loads():
    from mural_tpu.train.checkpoint import load_calibrator
    cal = load_calibrator(os.path.join(CKPT, "model.fdiri_cal.pkl"))
    probs = np.random.default_rng(0).dirichlet(np.ones(8), 50)
    out = cal.predict_proba(probs)
    assert out.shape == (50, 8)
    assert np.allclose(out.sum(1), 1, atol=1e-6)
