"""Fused code->BN->conv Pallas kernel: numerical parity with the unfused
module composition (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.models.layers import BNConv, one_hot_from_codes
from mural_tpu.ops import (code_conv1d, code_conv1d_reference,
                           fold_bn_conv_table)


def _setup(B=8, L=64, k=3, C=32, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 15, size=(B, L)).astype(np.uint8)
    module = BNConv(C, k)
    x = one_hot_from_codes(jnp.asarray(codes))
    variables = module.init(jax.random.key(seed), x, False)
    # make BN stats non-trivial
    variables = jax.tree.map(lambda a: a, variables)
    bs = variables["batch_stats"]["bn"]
    bs["mean"] = jnp.asarray(rng.normal(0.2, 0.1, 4), jnp.float32)
    bs["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 4), jnp.float32)
    p = variables["params"]["bn"]
    p["scale"] = jnp.asarray(rng.normal(1, 0.2, 4), jnp.float32)
    p["bias"] = jnp.asarray(rng.normal(0, 0.2, 4), jnp.float32)
    return codes, module, variables


def _table(variables):
    return fold_bn_conv_table(
        variables["params"]["conv"]["kernel"],
        variables["params"]["conv"]["bias"],
        variables["params"]["bn"]["scale"],
        variables["params"]["bn"]["bias"],
        variables["batch_stats"]["bn"]["mean"],
        variables["batch_stats"]["bn"]["var"])


@pytest.mark.parametrize("k,L,C", [(3, 64, 32), (7, 128, 8), (3, 100, 16)])
def test_reference_matches_unfused(k, L, C):
    codes, module, variables = _setup(k=k, L=L, C=C)
    unfused = module.apply(variables, one_hot_from_codes(
        jnp.asarray(codes)), False)
    table, bias = _table(variables)
    fused = code_conv1d_reference(jnp.asarray(codes), table, bias)
    assert np.allclose(np.asarray(fused), np.asarray(unfused),
                       atol=1e-4), np.abs(
                           np.asarray(fused) - np.asarray(unfused)).max()


@pytest.mark.parametrize("k,L,C,B", [(3, 64, 32, 8), (7, 512, 8, 4),
                                     (3, 401, 32, 8)])
def test_pallas_kernel_interpret_parity(k, L, C, B):
    codes, module, variables = _setup(B=B, k=k, L=L, C=C)
    table, bias = _table(variables)
    ref = code_conv1d_reference(jnp.asarray(codes), table, bias)
    out = code_conv1d(jnp.asarray(codes), table, bias, interpret=True)
    assert out.shape == (B, L, C)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_sentinel_padding_matches_zero_pad():
    """Edge positions must behave exactly like torch's zero padding."""
    codes, module, variables = _setup(B=4, k=7, L=32, C=8, seed=3)
    table, bias = _table(variables)
    out = code_conv1d_reference(jnp.asarray(codes), table, bias)
    unfused = module.apply(variables, one_hot_from_codes(
        jnp.asarray(codes)), False)
    # compare specifically the first/last k positions
    assert np.allclose(np.asarray(out[:, :7]), np.asarray(unfused[:, :7]),
                       atol=1e-4)
    assert np.allclose(np.asarray(out[:, -7:]),
                       np.asarray(unfused[:, -7:]), atol=1e-4)


def test_gather_windows_blocked_matches_reference():
    """Blocked (row-gather + binary realign) window gather must be
    bit-identical to the element gather for every offset phase mod 128
    and at arena edges."""
    import jax.numpy as jnp

    from mural_tpu.ops.window_gather import (gather_windows_blocked,
                                             gather_windows_reference,
                                             pad_arena_rows)

    rng = np.random.default_rng(3)
    for dw in (1, 127, 128, 129, 401, 500):
        A = 40_000
        arena = rng.integers(0, 15, A).astype(np.uint8)
        # all 128 phases + random + the extreme in-range starts
        starts = np.concatenate([
            np.arange(128, dtype=np.int64),
            rng.integers(0, A - dw, 128),
            [0, A - dw],
        ]).astype(np.int64)
        arena2d = jnp.asarray(pad_arena_rows(arena, dw))
        got = np.asarray(gather_windows_blocked(
            arena2d, jnp.asarray(starts), dw))
        want = np.asarray(gather_windows_reference(
            jnp.asarray(arena), jnp.asarray(starts), dw))
        np.testing.assert_array_equal(got, want, err_msg=f"dw={dw}")
