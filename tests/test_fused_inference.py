"""BN-folded fused inference must equal SNVNet2.apply(train=False)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mural_tpu.models.layers import one_hot_from_codes
from mural_tpu.models.snv import SNVNet2
from mural_tpu.ops.fused_inference import fold_snv2, snv2_fused_forward


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    config = dict(CNN_kernel_size=3)
    model = SNVNet2(emb_vocab=65, n_cat=13, lin_layer_sizes=[48, 24],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=16, kernel_size=3,
                    distal_fc_dropout=0.25, n_class=4)
    cat = jnp.asarray(rng.integers(0, 65, size=(8, 13)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 15, size=(8, 401)), jnp.uint8)
    variables = model.init(jax.random.key(0), cat, None,
                           one_hot_from_codes(codes), False)
    # non-trivial BN stats: run a few train steps' worth of stat updates
    for i in range(3):
        codes_t = jnp.asarray(rng.integers(0, 15, size=(8, 401)),
                              jnp.uint8)
        cat_t = jnp.asarray(rng.integers(0, 65, size=(8, 13)), jnp.int32)
        _, mut = model.apply(variables, cat_t, None,
                             one_hot_from_codes(codes_t), True,
                             rngs={"dropout": jax.random.key(i)},
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    return model, variables, config, cat, codes


def test_fused_matches_reference_apply(setup):
    model, variables, config, cat, codes = setup
    ref = model.apply(variables, cat, None, one_hot_from_codes(codes),
                      False)
    folded = fold_snv2(variables, config)
    out = snv2_fused_forward(folded, cat, codes,
                             k=config["CNN_kernel_size"], interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_fused_with_imported_shipped_checkpoint():
    import os
    ck = "/root/reference/examples/snv/models/checkpoint_6"
    if not os.path.exists(os.path.join(ck, "model")):
        pytest.skip("shipped checkpoint unavailable")
    import pickle
    from mural_tpu.predict.pipeline import build_model_from_config
    from mural_tpu.utils.torch_import import load_torch_checkpoint
    with open(os.path.join(ck, "model.config.pkl"), "rb") as fh:
        config = pickle.load(fh)
    model = build_model_from_config(config, 0, "snv")
    rng = np.random.default_rng(1)
    cat = jnp.asarray(rng.integers(0, 65, size=(4, 13)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 15, size=(4, 401)), jnp.uint8)
    template = model.init(jax.random.key(0), cat, None,
                          one_hot_from_codes(codes), False)
    variables = load_torch_checkpoint(os.path.join(ck, "model"), {
        "params": template["params"],
        "batch_stats": template["batch_stats"]})
    ref = model.apply(variables, cat, None, one_hot_from_codes(codes),
                      False)
    folded = fold_snv2(variables, config)
    out = snv2_fused_forward(folded, cat, codes,
                             k=config["CNN_kernel_size"], interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()
