"""Fused one-hot+BN+conv+pool *training* stem parity.

Layers of verification (ops/fused_train_stem + models/layers):

1. op level: ``code_conv_pool``'s pure-XLA reference path equals the
   explicit table-conv + torch-semantics max-pool composition, forward
   and gradients (custom VJP vs autodiff).
2. Pallas kernels in interpret mode equal the reference path (fwd+bwd).
3. histogram batch statistics equal two-pass activation statistics.
4. module level: ``FusedStemConvPool`` on codes equals
   ``BNConv -> max_pool1d`` on the one-hot -- identical param trees,
   forward, running-stat updates and parameter gradients.
5. model level: SNVNet2 forward/grad with raw codes equals the one-hot
   path; packed train-step trajectories stay within tolerance.
6. resident path: ``_gather_codes`` matches host-side strand-resolved
   window codes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mural_tpu.genome.encode import ONE_HOT_TABLE
from mural_tpu.models.layers import (BNConv, FusedStemConvPool,
                                     max_pool1d, one_hot_from_codes)
from mural_tpu.ops.fused_code_conv import fold_bn_conv_table
from mural_tpu.ops.fused_train_stem import (code_conv_pool,
                                            hist_batch_stats,
                                            pool_out_len)


def _rand_codes(rng, b, l):
    return rng.integers(0, 15, size=(b, l)).astype(np.uint8)


def _composition(codes, table, bias, pk, pp):
    """Unfused oracle: per-position table lookup (== BN-affine + conv on
    the one-hot) then torch-semantics max pool."""
    k = table.shape[0]
    cp = (k - 1) // 2
    B, L = codes.shape
    padded = jnp.pad(codes.astype(jnp.int32), ((0, 0), (cp, cp)),
                     constant_values=15)
    acc = jnp.zeros((B, L, table.shape[2]), jnp.float32)
    for kk in range(k):
        acc = acc + table[kk][padded[:, kk:kk + L]]
    conv = acc + bias[None, None, :]
    return max_pool1d(conv, pk, pk, pp)


@pytest.mark.parametrize("k,pk,pp,L", [(3, 15, 7, 401), (3, 3, 1, 201),
                                       (5, 15, 7, 401), (3, 7, 3, 120)])
def test_op_forward_matches_composition(k, pk, pp, L):
    rng = np.random.default_rng(7)
    codes = _rand_codes(rng, 8, L)
    C = 8
    table = jnp.asarray(rng.normal(size=(k, 16, C)), jnp.float32)
    table = table.at[:, 15, :].set(0.0)      # sentinel row == conv 0-pad
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    got = code_conv_pool(codes, table, bias, pk, pp)
    want = _composition(codes, table, bias, pk, pp)
    assert got.shape == (8, pool_out_len(L, pk, pp), C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k,pk,pp,L", [(3, 15, 7, 401), (3, 3, 1, 201)])
def test_op_grads_match_autodiff(k, pk, pp, L):
    rng = np.random.default_rng(8)
    codes = _rand_codes(rng, 8, L)
    C = 8
    table = jnp.asarray(rng.normal(size=(k, 16, C)), jnp.float32)
    table = table.at[:, 15, :].set(0.0)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, pool_out_len(L, pk, pp), C)),
                    jnp.float32)

    def loss_fused(t, b):
        return jnp.sum(code_conv_pool(codes, t, b, pk, pp) * w)

    def loss_ref(t, b):
        return jnp.sum(_composition(codes, t, b, pk, pp) * w)

    gt, gb = jax.grad(loss_fused, argnums=(0, 1))(table, bias)
    rt, rb = jax.grad(loss_ref, argnums=(0, 1))(table, bias)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,pk,pp,L,B", [(3, 15, 7, 401, 8),
                                         (3, 3, 1, 201, 6),
                                         (5, 7, 3, 130, 4)])
def test_pallas_interpret_matches_reference(k, pk, pp, L, B):
    rng = np.random.default_rng(9)
    codes = _rand_codes(rng, B, L)
    C = 8
    table = jnp.asarray(rng.normal(size=(k, 16, C)), jnp.float32)
    table = table.at[:, 15, :].set(0.0)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

    # forward: interpret-mode Pallas path vs the CPU reference path.
    # Tolerances reflect the kernel's split-bf16 matmuls (module
    # docstring): ~2^-17 relative of the f32 operand per product, a few
    # e-5 absolute at these O(1) operand scales -- far below BN eps and
    # the unfused bf16 path's error.
    ref_out = code_conv_pool(codes, table, bias, pk, pp)
    pal_out = code_conv_pool(codes, table, bias, pk, pp,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                               rtol=1e-3, atol=1e-4)

    P = pool_out_len(L, pk, pp)
    w = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)

    def loss(t, b, interp):
        return jnp.sum(code_conv_pool(codes, t, b, pk, pp, interp) * w)

    rt, rb = jax.grad(loss, argnums=(0, 1))(table, bias, False)
    pt, pb = jax.grad(loss, argnums=(0, 1))(table, bias, True)
    np.testing.assert_allclose(np.asarray(pt), np.asarray(rt),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(rb),
                               rtol=1e-3, atol=2e-4)


def test_hist_stats_match_activation_stats():
    rng = np.random.default_rng(10)
    codes = _rand_codes(rng, 16, 221)
    mean, var_b, var_u = hist_batch_stats(jnp.asarray(codes))
    oh = np.asarray(one_hot_from_codes(jnp.asarray(codes)),
                    np.float64).reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(mean), oh.mean(0), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_b), oh.var(0), rtol=1e-5,
                               atol=1e-6)
    n = oh.shape[0]
    np.testing.assert_allclose(np.asarray(var_u),
                               oh.var(0) * n / (n - 1), rtol=1e-5,
                               atol=1e-6)


def _unfused_stem_apply(variables, oh, train, pool):
    class Unfused:
        pass

    import flax.linen as nn

    class Mod(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            x = BNConv(8, 3, name="conv1")(x, train)
            return max_pool1d(x, *pool)

    return Mod().apply(variables, oh, train, mutable=["batch_stats"])


def _fused_stem_apply(variables, codes, train, pool):
    import flax.linen as nn

    class Mod(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return FusedStemConvPool(8, 3, pool, name="conv1")(x, train)

    return Mod().apply(variables, codes, train, mutable=["batch_stats"])


@pytest.mark.parametrize("pool", [(15, 15, 7), (3, 3, 1)])
def test_module_parity_forward_stats_grads(pool):
    import flax.linen as nn

    rng = np.random.default_rng(11)
    codes = jnp.asarray(_rand_codes(rng, 8, 401))
    oh = one_hot_from_codes(codes)

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return FusedStemConvPool(8, 3, pool, name="conv1")(x, train)

    class Unfused(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            x = BNConv(8, 3, name="conv1")(x, train)
            return max_pool1d(x, *pool)

    vf = Fused().init(jax.random.key(0), codes, True)
    vu = Unfused().init(jax.random.key(0), oh, True)
    # identical param/variable trees (paths, shapes, values)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), vf, vu)

    # non-trivial BN/conv params
    def perturb(tree):
        leaves, treedef = jax.tree.flatten(tree)
        r = np.random.default_rng(5)
        return treedef.unflatten([
            jnp.asarray(r.normal(0.5, 0.7, size=l.shape), l.dtype)
            for l in leaves])

    params = perturb(vu["params"])
    variables = {"params": params, "batch_stats": vu["batch_stats"]}

    out_u, mut_u = Unfused().apply(variables, oh, True,
                                   mutable=["batch_stats"])
    out_f, mut_f = Fused().apply(variables, codes, True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-4, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        mut_f["batch_stats"], mut_u["batch_stats"])

    w = jnp.asarray(rng.normal(size=out_u.shape), jnp.float32)

    def loss_u(p):
        o, _ = Unfused().apply({"params": p,
                                "batch_stats": vu["batch_stats"]},
                               oh, True, mutable=["batch_stats"])
        return jnp.sum(o * w)

    def loss_f(p):
        o, _ = Fused().apply({"params": p,
                              "batch_stats": vu["batch_stats"]},
                             codes, True, mutable=["batch_stats"])
        return jnp.sum(o * w)

    gu = jax.grad(loss_u)(params)
    gf = jax.grad(loss_f)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4), gf, gu)

    # eval mode (running stats) parity
    out_ue = Unfused().apply(variables, oh, False)
    out_fe = Fused().apply(variables, codes, False)
    np.testing.assert_allclose(np.asarray(out_fe), np.asarray(out_ue),
                               rtol=2e-4, atol=2e-5)


def _snv2(in_ch=4):
    from mural_tpu.models.snv import SNVNet2
    return SNVNet2(emb_vocab=65, n_cat=13, lin_layer_sizes=(30, 10),
                   emb_dropout=0.0, lin_layer_dropouts=(0.0, 0.0),
                   in_channels=in_ch, out_channels=8, kernel_size=3,
                   distal_fc_dropout=0.0, n_class=4)


def test_model_level_codes_vs_onehot():
    rng = np.random.default_rng(12)
    B, L = 8, 221
    codes = jnp.asarray(_rand_codes(rng, B, L))
    oh = one_hot_from_codes(codes)
    cat = jnp.asarray(rng.integers(0, 64, size=(B, 13)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 4, size=(B,)), jnp.int32)
    model = _snv2()
    variables = model.init(jax.random.key(1), cat, None, oh, True)
    v_codes = model.init(jax.random.key(1), cat, None, codes, True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables, v_codes)

    def loss(p, distal):
        out, mut = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            cat, None, distal, True, rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"])
        ce = -jnp.take_along_axis(jax.nn.log_softmax(out, axis=1),
                                  y[:, None], axis=1).sum()
        return ce, mut["batch_stats"]

    (l_oh, s_oh), g_oh = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], oh)
    (l_cd, s_cd), g_cd = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], codes)
    np.testing.assert_allclose(float(l_cd), float(l_oh), rtol=1e-5)

    # gradient parity, tolerance scaled to each leaf's magnitude: the
    # two paths accumulate f32 rounding differently through a deep
    # composition, giving ~2e-5 of the leaf's gradient scale (measured);
    # 1e-4 * scale keeps ~5x margin without a flat atol that a
    # 23-magnitude conv-kernel grad leaf would trip
    def close(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.max(np.abs(a - b)) <= 1e-4 * (np.max(np.abs(b)) + 0.1)

    jax.tree.map(close, g_cd, g_oh)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), s_cd, s_oh)


def test_packed_trajectory_fused_vs_unfused():
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.packed import (make_packed_train_step,
                                        pack_state)
    from mural_tpu.train.state import create_train_state

    rng = np.random.default_rng(13)
    B, L, steps = 8, 221, 5
    model = _snv2()
    codes_all = _rand_codes(rng, steps * B, L)
    cat_all = rng.integers(0, 64, size=(steps * B, 13)).astype(np.int32)
    y_all = rng.integers(0, 4, size=(steps * B,)).astype(np.int32)

    oh0 = one_hot_from_codes(jnp.asarray(codes_all[:2]))
    variables = model.init(jax.random.key(3),
                           jnp.asarray(cat_all[:2]), None, oh0, True)
    schedule = LRSchedule.build("StepLR", 5e-3, 0.9, B, steps * B,
                                1e-4, 1e-6)

    losses = {}
    for fused in (False, True):
        state = pack_state(create_train_state(
            model, jax.tree.map(jnp.copy, variables), "Adam", 0.0,
            schedule))
        step = make_packed_train_step(model, state, donate=False,
                                      fused_stem=fused)
        ls = []
        for i in range(steps):
            sl = slice(i * B, (i + 1) * B)
            state, loss, _ = step(
                state, jnp.asarray(y_all[sl]), jnp.asarray(cat_all[sl]),
                None, jnp.asarray(codes_all[sl]),
                jnp.ones((B,), jnp.float32), jax.random.key(7))
            ls.append(float(loss))
        losses[fused] = ls
    # step 0 is pre-divergence (same params): pinned tight; later steps
    # amplify ~1e-6 per-step fp differences through Adam chaotically
    np.testing.assert_allclose(losses[True][0], losses[False][0],
                               rtol=1e-5)
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)


def test_gather_codes_matches_host_windows():
    from mural_tpu.genome.fasta import COMPLEMENT
    from mural_tpu.ops.window_gather import pad_arena_rows
    from mural_tpu.train.resident import _gather_codes

    rng = np.random.default_rng(14)
    arena = rng.integers(0, 15, size=(1000,)).astype(np.uint8)
    dw = 37
    astart = rng.integers(0, len(arena) - dw, size=(50,)).astype(np.int32)
    neg = rng.integers(0, 2, size=(50,)).astype(bool)
    rows = jnp.asarray(rng.permutation(50)[:16].astype(np.int32))
    got = np.asarray(_gather_codes(
        jnp.asarray(pad_arena_rows(arena, dw)), jnp.asarray(astart),
        jnp.asarray(neg), rows, dw))
    for j, r in enumerate(np.asarray(rows)):
        win = arena[astart[r]:astart[r] + dw].astype(np.int64)
        if neg[r]:
            win = COMPLEMENT[win][::-1]
        np.testing.assert_array_equal(got[j], win)
