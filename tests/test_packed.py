"""Packed (flat-buffer) train state: equivalence with the per-leaf step.

The packed step (train/packed.py) must produce the same training
trajectory as steps.make_train_step: every optimizer transform is
elementwise or a global reduction, so the flat form differs only by f32
reduction order inside the global-norm clip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.models.registry import build_model
from mural_tpu.train.optim import LRSchedule
from mural_tpu.train.packed import (TreeSpec, make_packed_eval_step,
                                    make_packed_train_step, pack_state,
                                    pack_tree, unpack_tree,
                                    unpack_tree_np)
from mural_tpu.train.state import create_train_state
from mural_tpu.train.steps import make_eval_step, make_train_step


def _tiny_model():
    config = dict(local_order=2, local_hidden1_size=20,
                  local_hidden2_size=10, emb_dropout=0.1,
                  local_dropout=0.1, CNN_out_channels=8,
                  CNN_kernel_size=3, distal_fc_dropout=0.25)
    common = dict(emb_dims=[(17, 2)] * 9, n_cont=0, n_class=4,
                  distal_order=1, in_channels=4)
    return build_model(2, config, common, "snv")


def _batch(batch=16, n_cat=9, width=101, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.integers(0, 4, size=batch).astype(np.int32))
    cat = jnp.asarray(rng.integers(0, 17, size=(batch, n_cat))
                      .astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 15, size=(batch, width))
                        .astype(np.uint8))
    mask = jnp.ones(batch, jnp.float32)
    return y, cat, codes, mask


@pytest.fixture(scope="module")
def setup():
    model = _tiny_model()
    y, cat, codes, mask = _batch()
    from mural_tpu.models.layers import one_hot_from_codes
    variables = model.init(jax.random.key(0), cat, None,
                           one_hot_from_codes(codes), False)
    sched = LRSchedule.build("StepLR", 1e-3, 0.9, 16, 1000, 1e-4, 1e-6)
    return model, variables, sched, (y, cat, codes, mask)


def test_pack_unpack_roundtrip(setup):
    model, variables, sched, _ = setup
    spec = TreeSpec.of(variables["params"])
    flat = pack_tree(variables["params"], spec)
    assert flat.shape == (spec.total,)
    back = jax.tree.map(np.asarray, unpack_tree(flat, spec))
    ref = jax.tree.map(np.asarray, variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 ref, back)
    # host-side unpack agrees too
    back_np = unpack_tree_np(np.asarray(flat), spec)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 ref, back_np)


@pytest.mark.slow
def test_packed_trajectory_matches_unpacked(setup):
    model, variables, sched, (y, cat, codes, mask) = setup
    rng = jax.random.key(7)

    su = create_train_state(model, variables, "Adam", 1e-4, sched)
    sp = pack_state(create_train_state(model, variables, "Adam", 1e-4,
                                       sched))
    step_u = make_train_step(model, donate=False)
    step_p = make_packed_train_step(model, sp, donate=False)

    for i in range(6):
        su, lu, lru = step_u(su, y, cat, None, codes, mask, rng)
        sp, lp, lrp = step_p(sp, y, cat, None, codes, mask, rng)
        np.testing.assert_allclose(float(lu), float(lp), rtol=1e-4)
        assert float(lru) == float(lrp)

    flat_u = np.concatenate([np.asarray(l).ravel()
                             for l in jax.tree.leaves(su.params)])
    # Adam divides by sqrt(v)+eps, so the clip-norm reduction-order noise
    # is amplified up to ~lr per step on near-zero-gradient params; the
    # tight trajectory contract is the per-step loss check above.
    np.testing.assert_allclose(flat_u, np.asarray(sp.flat_params),
                               rtol=5e-3, atol=2e-3)
    # batch stats track the (slightly diverged) activations
    stats_u = np.concatenate([np.asarray(l).ravel()
                              for l in jax.tree.leaves(su.batch_stats)])
    np.testing.assert_allclose(stats_u, np.asarray(sp.flat_stats),
                               rtol=5e-3, atol=1e-4)


def test_scan_step_matches_single_steps(setup):
    from mural_tpu.train.packed import make_packed_train_step_scan
    model, variables, sched, (y, cat, codes, mask) = setup
    rng = jax.random.key(11)
    K = 4
    # K distinct microbatches
    ys, cats, codess, masks = [], [], [], []
    for i in range(K):
        yb, cb, db, mb = _batch(seed=100 + i)
        ys.append(yb); cats.append(cb); codess.append(db); masks.append(mb)
    ys = jnp.stack(ys); cats = jnp.stack(cats)
    codess = jnp.stack(codess); masks = jnp.stack(masks)

    s1 = pack_state(create_train_state(model, variables, "Adam", 1e-4,
                                       sched))
    sK = pack_state(create_train_state(model, variables, "Adam", 1e-4,
                                       sched))
    step1 = make_packed_train_step(model, s1, donate=False)
    stepK = make_packed_train_step_scan(model, sK)

    losses1 = []
    for i in range(K):
        s1, l, lr1 = step1(s1, ys[i], cats[i], None, codess[i], masks[i],
                           rng)
        losses1.append(float(l))
    sK, lossesK, lrK = stepK(sK, ys, cats, None, codess, masks, rng)

    np.testing.assert_allclose(losses1, np.asarray(lossesK), rtol=1e-5)
    assert float(lr1) == float(lrK)
    # loss trajectory above is the tight contract; params see Adam-eps
    # amplification of scan-vs-loop reduction-order noise
    np.testing.assert_allclose(np.asarray(s1.flat_params),
                               np.asarray(sK.flat_params),
                               rtol=1e-2, atol=1e-3)
    assert int(sK.step) == K


def test_packed_eval_matches_unpacked(setup):
    model, variables, sched, (y, cat, codes, mask) = setup
    sp = pack_state(create_train_state(model, variables, "Adam", 0.0,
                                       sched))
    ev_u = make_eval_step(model)
    ev_p = make_packed_eval_step(model, sp)
    lg_u, loss_u = ev_u(variables["params"], variables["batch_stats"],
                        y, cat, None, codes, mask)
    lg_p, loss_p = ev_p(sp.flat_params, sp.flat_stats, y, cat, None,
                        codes, mask)
    np.testing.assert_array_equal(np.asarray(lg_u), np.asarray(lg_p))
    assert float(loss_u) == float(loss_p)


def test_packed_respects_trainable_mask(setup):
    model, variables, sched, (y, cat, codes, mask) = setup
    # freeze everything except leaves whose path contains 'local_fc'
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])
    mask_flat = []
    frozen_paths = []
    for path, leaf in flat[0]:
        keys = [p.key for p in path]
        trainable = "local_fc" in keys
        if not trainable:
            frozen_paths.append(keys)
        mask_flat.append(jnp.asarray(1.0 if trainable else 0.0))
    tmask = jax.tree_util.tree_unflatten(flat[1], mask_flat)

    sp0 = pack_state(create_train_state(model, variables, "Adam", 1e-4,
                                        sched, trainable_mask=tmask))
    step_p = make_packed_train_step(model, sp0, donate=False)
    sp = sp0
    rng = jax.random.key(3)
    for _ in range(3):
        sp, _, _ = step_p(sp, y, cat, None, codes, mask, rng)

    before = unpack_tree_np(np.asarray(sp0.flat_params), sp0.p_spec)
    after = unpack_tree_np(np.asarray(sp.flat_params), sp.p_spec)
    b_flat = jax.tree_util.tree_flatten_with_path(before)[0]
    a_flat = jax.tree_util.tree_flatten_with_path(after)[0]
    changed_any = False
    for (path, b), (_, a) in zip(b_flat, a_flat):
        keys = [p.key for p in path]
        if "local_fc" in keys:
            changed_any = changed_any or not np.array_equal(a, b)
        else:
            np.testing.assert_array_equal(a, b)
    assert changed_any
