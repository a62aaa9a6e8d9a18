"""Model-layer tests: torch-op parity for primitives + full-net checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.models import layers as L
from mural_tpu.models.indel import UNetSmall
from mural_tpu.models.registry import build_model
from mural_tpu.models.snv import SNVNet0, SNVNet1, SNVNet2, SNVNet3

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("k,s,p,n", [(3, 3, 1, 201), (15, 15, 7, 401),
                                     (7, 7, 3, 27), (3, 3, 1, 4)])
def test_maxpool_torch_parity(k, s, p, n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, n, 5)).astype(np.float32)
    ours = L.max_pool1d(jnp.asarray(x), k, s, p)
    ref = torch.nn.functional.max_pool1d(
        torch.from_numpy(x.transpose(0, 2, 1)), k, s, p).numpy()
    assert np.allclose(np.asarray(ours), ref.transpose(0, 2, 1), atol=1e-6)


def test_conv1d_torch_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 50, 4)).astype(np.float32)
    w = rng.normal(size=(8, 4, 3)).astype(np.float32)  # torch (out,in,k)
    b = rng.normal(size=(8,)).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(b), padding=1).numpy().transpose(0, 2, 1)
    conv = __import__("flax.linen", fromlist=["x"]).Conv(
        8, kernel_size=(3,), padding=[(1, 1)])
    # flax kernel layout (k, in, out)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                         "bias": jnp.asarray(b)}}
    ours = conv.apply(params, jnp.asarray(x))
    assert np.allclose(np.asarray(ours), ref, atol=1e-4)


def test_batchnorm_torch_parity():
    """TorchBatchNorm must match torch.nn.BatchNorm1d exactly in both
    train (outputs + running stats incl. unbiased var) and eval modes."""
    rng = np.random.default_rng(2)
    x1 = rng.normal(2.0, 3.0, size=(16, 10)).astype(np.float32)
    x2 = rng.normal(-1.0, 0.5, size=(16, 10)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(10)
    fbn = L.TorchBatchNorm()
    variables = fbn.init(jax.random.key(0), jnp.asarray(x1), False)

    tbn.train()
    for x in (x1, x2):
        t_out = tbn(torch.from_numpy(x)).detach().numpy()
        f_out, mut = fbn.apply(variables, jnp.asarray(x), False,
                               mutable=["batch_stats"])
        variables = {"params": variables.get("params", {}), **mut}
        assert np.allclose(np.asarray(f_out), t_out, atol=1e-4)
    assert np.allclose(np.asarray(variables["batch_stats"]["mean"]),
                       tbn.running_mean.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(variables["batch_stats"]["var"]),
                       tbn.running_var.numpy(), atol=1e-4)

    tbn.eval()
    t_out = tbn(torch.from_numpy(x1)).detach().numpy()
    f_out = fbn.apply(variables, jnp.asarray(x1), True)
    assert np.allclose(np.asarray(f_out), t_out, atol=1e-4)

    # 3-D (N, L, C) vs torch (N, C, L)
    x3 = rng.normal(size=(4, 7, 6)).astype(np.float32)
    tbn3 = torch.nn.BatchNorm1d(6)
    tbn3.train()
    t_out = tbn3(torch.from_numpy(x3.transpose(0, 2, 1))).detach().numpy()
    fbn3 = L.TorchBatchNorm()
    v3 = fbn3.init(jax.random.key(0), jnp.asarray(x3), False)
    f_out, mut3 = fbn3.apply(v3, jnp.asarray(x3), False,
                             mutable=["batch_stats"])
    assert np.allclose(np.asarray(f_out), t_out.transpose(0, 2, 1),
                       atol=1e-4)
    assert np.allclose(np.asarray(mut3["batch_stats"]["var"]),
                       tbn3.running_var.numpy(), atol=1e-4)


def _snv_inputs(rng, B=8, K=13, L=401, n_cont=0):
    cat = jnp.asarray(rng.integers(0, 65, size=(B, K)), dtype=jnp.int32)
    cont = jnp.asarray(rng.normal(size=(B, max(n_cont, 1))),
                       dtype=jnp.float32) if n_cont else None
    codes = jnp.asarray(rng.integers(0, 15, size=(B, L)), dtype=jnp.uint8)
    distal = L_one_hot(codes)
    return cat, cont, distal


def L_one_hot(codes):
    return L.one_hot_from_codes(codes)


def test_snvnet2_forward_properties():
    rng = np.random.default_rng(3)
    cat, cont, distal = _snv_inputs(rng)
    model = SNVNet2(emb_vocab=65, n_cat=13, lin_layer_sizes=[150, 80],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=32, kernel_size=3,
                    distal_fc_dropout=0.25, n_class=4)
    variables = model.init(jax.random.key(0), cat, cont, distal, False)
    out = model.apply(variables, cat, cont, distal, False)
    assert out.shape == (8, 4)
    # output is log of an (approx) normalized distribution
    assert np.allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0, atol=1e-3)
    # train mode runs with dropout rng and updates batch stats
    out2, mut = model.apply(variables, cat, cont, distal, True,
                            rngs={"dropout": jax.random.key(1)},
                            mutable=["batch_stats"])
    assert out2.shape == (8, 4)
    assert "batch_stats" in mut


def test_snvnet_variants_and_registry():
    rng = np.random.default_rng(4)
    cat, _, distal = _snv_inputs(rng, n_cont=0)
    cont2 = jnp.asarray(rng.normal(size=(8, 2)), dtype=jnp.float32)
    config = dict(local_order=3, local_hidden1_size=150,
                  local_hidden2_size=80, emb_dropout=0.1, local_dropout=0.1,
                  CNN_out_channels=16, CNN_kernel_size=3,
                  distal_fc_dropout=0.25)
    common = dict(emb_dims=[(65, 2)] * 13, n_cont=0, n_class=4,
                  distal_order=1, in_channels=4)
    for no, needs_distal in [(0, False), (1, True), (2, True), (3, True)]:
        model = build_model(no, config, common, "snv")
        v = model.init(jax.random.key(no), cat, None, distal, False)
        out = model.apply(v, cat, None, distal, False)
        assert out.shape == (8, 4)
    # Network3 with cont features (3-way average)
    common3 = dict(common, n_cont=2)
    m3 = build_model(3, config, common3, "snv")
    v = m3.init(jax.random.key(9), cat, cont2, distal, False)
    out = m3.apply(v, cat, cont2, distal, False)
    assert np.allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0, atol=1e-3)


@pytest.mark.slow
def test_unet_shapes_and_reverse():
    rng = np.random.default_rng(5)
    B, Lw = 4, 2000
    codes = jnp.asarray(rng.integers(0, 15, size=(B, Lw)), dtype=jnp.uint8)
    distal = L_one_hot(codes)
    config = dict(CNN_out_channels=8, CNN_kernel_size=7,
                  down_list=[1, 4, 5, 5, 5, 2], use_reverse=True)
    common = dict(emb_dims=[], n_cont=0, n_class=8, distal_order=1,
                  in_channels=4)
    model = build_model(0, config, common, "indel")
    v = model.init(jax.random.key(0), None, None, distal, False)
    out = model.apply(v, None, None, distal, False)
    assert out.shape == (B, 8)
    assert (np.asarray(out) >= 0).all()   # Softplus head
    # train mode
    out2, mut = model.apply(v, None, None, distal, True,
                            rngs={"dropout": jax.random.key(1)},
                            mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_unet_stem_reverse_complement_relation():
    """With use_reverse, stem(revcomp(x)) == flip_length(stem(x))
    (model_indel.py:154-155): S(x) = C(x) + flipL(C(flipLC(x)))."""
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            conv = nn.Conv(4, (7,), padding=[(3, 3)], name="c")
            bnm = L.TorchBatchNorm(name="b")
            fwd = bnm(conv(x), True)
            rev = bnm(conv(x[:, ::-1, ::-1]), True)[:, ::-1, :]
            return fwd + rev

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 40, 4)), dtype=jnp.float32)
    stem = Stem()
    v = stem.init(jax.random.key(0), x)
    s_f = np.asarray(stem.apply(v, x))
    s_r = np.asarray(stem.apply(v, x[:, ::-1, ::-1]))
    assert np.allclose(s_r, s_f[:, ::-1, :], atol=1e-5)


def test_torch_style_init_stats():
    from mural_tpu.models.init import torch_style_init
    rng = np.random.default_rng(7)
    cat, _, distal = _snv_inputs(rng)
    model = SNVNet2(emb_vocab=65, n_cat=13, lin_layer_sizes=[150, 80],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=32, kernel_size=3,
                    distal_fc_dropout=0.25, n_class=4)
    variables = model.init(jax.random.key(0), cat, None, distal, False)
    params = torch_style_init(variables["params"], seed=0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = path[-1].key
        if name == "bias":
            assert np.allclose(np.asarray(leaf), 0)
        if name == "kernel" and leaf.ndim == 2:
            fin = leaf.shape[0]
            std = np.asarray(leaf).std()
            assert abs(std - np.sqrt(2 / fin)) < 0.5 * np.sqrt(2 / fin)


def test_snv_max_reference_window():
    """The reference supports expanded windows up to 64,000 bp
    (CHANGELOG:16-20); the dual-tower pyramid must handle
    distal_radius 32000 without shape or numerics failures."""
    import jax
    import jax.numpy as jnp

    from mural_tpu.models.layers import one_hot_from_codes
    from mural_tpu.models.registry import build_model

    radius = 32000
    W = 2 * radius + 1
    config = dict(local_order=3, local_hidden1_size=10,
                  local_hidden2_size=5, emb_dropout=0.1,
                  local_dropout=0.1, CNN_out_channels=4,
                  CNN_kernel_size=3, distal_fc_dropout=0.25)
    common = dict(emb_dims=[(65, 2)] * 13, n_cont=0, n_class=4,
                  distal_order=1, in_channels=4)
    model = build_model(2, config, common, "snv")
    rng = np.random.default_rng(0)
    cat = jnp.asarray(rng.integers(0, 65, (2, 13)).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 15, (2, W)).astype(np.uint8))
    v = model.init(jax.random.key(0), cat, None,
                   one_hot_from_codes(codes), False)
    out = model.apply(v, cat, None, one_hot_from_codes(codes), False)
    assert out.shape == (2, 4)
    assert bool(jnp.isfinite(out).all())


def test_one_hot_matches_table_gather():
    """one_hot_from_codes (iota-compare + HIGHEST dot) is bit-identical
    to the naive table gather ONE_HOT_TABLE[codes], f32 and bf16 --
    guards the gather->matmul rewrite cited in models/layers.py."""
    import jax.numpy as jnp

    from mural_tpu.genome.encode import NUM_CODES, ONE_HOT_TABLE
    from mural_tpu.models.layers import one_hot_from_codes

    rng = np.random.default_rng(42)
    codes = rng.integers(0, NUM_CODES, (64, 37)).astype(np.uint8)
    # include the 15 sentinel: must one-hot to an exact zero row
    codes[0, :4] = NUM_CODES
    table16 = np.concatenate([ONE_HOT_TABLE, np.zeros((1, 4), np.float32)])
    for dtype in (jnp.float32, jnp.bfloat16):
        got = np.asarray(one_hot_from_codes(jnp.asarray(codes), dtype))
        want = table16.astype(dtype)[codes]
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, np.asarray(want))


def test_onehot_embed_matches_nn_embed():
    """OneHotEmbed (iota-compare + HIGHEST matmul) is bit-identical to
    nn.Embed's gather in both directions, with the same param path."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mural_tpu.models.layers import OneHotEmbed

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 65, (16, 13)).astype(np.int32))
    ours = OneHotEmbed(65, 5, name="emb_layer")
    ref = nn.Embed(65, 5, name="emb_layer")
    v = ref.init(jax.random.key(1), idx)
    assert "embedding" in v["params"]
    out_ours = ours.apply(v, idx)
    out_ref = ref.apply(v, idx)
    np.testing.assert_array_equal(np.asarray(out_ours),
                                  np.asarray(out_ref))
    g_ours = jax.grad(lambda p: (ours.apply(p, idx) ** 2).sum())(v)
    g_ref = jax.grad(lambda p: (ref.apply(p, idx) ** 2).sum())(v)
    np.testing.assert_allclose(
        np.asarray(g_ours["params"]["embedding"]),
        np.asarray(g_ref["params"]["embedding"]), rtol=1e-6, atol=1e-6)


def test_global_max_1d_matches_jnp_max_and_torch_ties():
    import jax
    import jax.numpy as jnp
    import torch

    from mural_tpu.models.layers import global_max_1d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 50, 6)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(global_max_1d(x)),
                                  np.asarray(jnp.max(x, axis=1)))
    # tie routing: gradient goes to the FIRST max, like torch max(dim)
    xt_np = np.zeros((2, 5, 3), np.float32)
    xt_np[:, 1, :] = 2.0
    xt_np[:, 3, :] = 2.0          # tied with position 1
    g = np.asarray(jax.grad(
        lambda v: global_max_1d(v).sum())(jnp.asarray(xt_np)))
    tt = torch.tensor(xt_np.transpose(0, 2, 1), requires_grad=True)
    tt.max(dim=2).values.sum().backward()
    np.testing.assert_array_equal(g, tt.grad.numpy().transpose(0, 2, 1))


def test_unet_geometry_fail_fast():
    """A window length not divisible by the cumulative down_list stride
    must raise a flag-naming ValueError at trace time instead of the
    XLA broadcast error the misaligned skip-adds otherwise produce
    (found driving `mural_indel train --distal_radius 200` with the
    default down_list; the reference torch model crashes as opaquely)."""
    import jax
    import jax.numpy as jnp
    import pytest

    model = UNetSmall(n_class=4, out_channels=4, kernel_size=3,
                      downsize=(1, 4, 5, 5, 5, 2))
    bad = jnp.zeros((2, 400, 4), jnp.float32)      # 400 % 1000 != 0
    with pytest.raises(ValueError, match="down_list"):
        model.init(jax.random.key(0), None, None, bad, False)

    ok = jnp.zeros((2, 1000, 4), jnp.float32)      # 1000 % 1000 == 0
    v = model.init(jax.random.key(0), None, None, ok, False)
    out = model.apply(v, None, None, ok, False)
    assert out.shape == (2, 4)
