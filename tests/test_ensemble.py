"""Vmapped trial ensembles: traced LR schedules, member-for-member
equivalence with serial resident trials, live-mask freezing, and the
runner's signature grouping."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mural_tpu.data.dataset import prepare_dataset
from mural_tpu.train.optim import LRSchedule
from mural_tpu.tune.space import Choice, LogUniform


@pytest.fixture(scope="module")
def ds(tiny_genome, tiny_bed):
    return prepare_dataset(tiny_bed, tiny_genome["path"],
                           central_bp=10_000, local_radius=4,
                           local_order=3, distal_radius=25,
                           model_type="snv")


@pytest.mark.parametrize("kind", ["StepLR", "StepLR2", "constant"])
def test_schedule_arrays_match_lr_schedule(kind):
    """ScheduleArrays.lr_at must equal LRSchedule.lr_at member for
    member across the step/epoch grid, including decay-restart phases."""
    from mural_tpu.train.ensemble import ScheduleArrays

    params = [(1e-2, 0.5, 1e-3, 1e-5), (5e-3, 0.9, 1e-4, 1e-6),
              (2e-3, 0.3, 5e-4, 2e-4)]   # fast decay -> restarts soon
    schedules = [LRSchedule.build(kind, lr, g, 32, 4096, r, m)
                 for lr, g, r, m in params]
    arrs = ScheduleArrays.from_schedules(schedules)

    steps = np.asarray([0, 1, 7, 63, 500, 5000, 20000])
    for epoch in (0, 1, 3):
        for step in steps:
            got = np.asarray(arrs.lr_at(
                jnp.full(3, step, jnp.int32),
                jnp.full(3, epoch, jnp.int32),
                jnp.asarray([s.base_lr for s in schedules],
                            jnp.float32)))
            want = [float(s.lr_at(jnp.asarray(step),
                                  jnp.asarray(epoch),
                                  jnp.asarray(s.base_lr)))
                    for s in schedules]
            np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("optim", ["SGD", "Adam", "AdamW", "AdamW2"])
def test_opt_update_matches_optax(optim):
    """The inlined per-member optimizer must reproduce the packed
    path's optax chain (clip_by_global_norm(10) -> build_optimizer)
    value-for-value over a multi-step run with weight decay, covering
    both clipped (||g|| > 10) and unclipped gradients."""
    import optax

    from mural_tpu.train.ensemble import _opt_init, _opt_update
    from mural_tpu.train.optim import build_optimizer

    rng = np.random.default_rng(0)
    P, wd = 257, 3e-3
    p = jnp.asarray(rng.normal(0, 0.1, P), jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     build_optimizer(optim, wd))
    opt_ref = tx.init(p)
    opt_mine = jax.tree.map(lambda x: x[0],
                            _opt_init(optim, p[None, :]))
    for step in range(6):
        scale = 5.0 if step % 2 else 0.1      # alternate clip regimes
        g = jnp.asarray(rng.normal(0, scale, P), jnp.float32)
        u_ref, opt_ref = tx.update(g, opt_ref, p)
        u_mine, opt_mine = _opt_update(optim, g, p, opt_mine,
                                       jnp.float32(wd))
        # tolerance: the clip scale rounds differently ((t/gn)*10 vs
        # t*(10/gn)) -- pure fp noise, no formula drift
        np.testing.assert_allclose(np.asarray(u_mine),
                                   np.asarray(u_ref), rtol=5e-5,
                                   atol=1e-7)
        p = p - 1e-3 * u_ref


@pytest.mark.parametrize("optim", ["SGD", "Adam", "AdamW2"])
def test_ensemble_epoch_matches_serial_resident(ds, optim):
    """Each ensemble member's epoch must reproduce its own serial
    resident trial, with members differing in learning rate, weight
    decay, gamma, and seed.

    test_opt_update_matches_optax pins the per-step optimizer formulas
    tight; here the full epoch is compared at accumulation scale (the
    inlined update rounds in a different op order than optax, ~1
    ulp/step of drift over ~200 steps, which Adam's sign-normalised
    updates amplify -- see the in-test comments)."""
    from mural_tpu.models.snv import SNVNet2
    from mural_tpu.train.ensemble import (create_ensemble_state,
                                          make_ensemble_epoch_fn,
                                          make_ensemble_eval_fn)
    from mural_tpu.train.loop import _init_variables
    from mural_tpu.train.packed import pack_state
    from mural_tpu.train.resident import (make_resident,
                                          make_resident_epoch_fn,
                                          make_resident_eval_fn,
                                          stack_epoch_rows)
    from mural_tpu.train.state import create_train_state

    B, T = 32, 3
    model = SNVNet2(emb_vocab=65, n_cat=ds.cat.shape[1],
                    lin_layer_sizes=[24, 12],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=8, kernel_size=3,
                    distal_fc_dropout=0.1, n_class=4)
    lrs = [5e-3, 1e-3, 2e-2]
    wds = [0.0, 1e-4, 1e-2]
    gammas = [0.9, 0.5, 0.99]
    seeds = [0, 1, 2]
    schedules = [LRSchedule.build("StepLR", lrs[t], gammas[t], B,
                                  ds.n_sites, 1e-4, 1e-6)
                 for t in range(T)]
    variables_list = [_init_variables(model, ds, s) for s in seeds]
    res = make_resident(ds)
    rows_list = [stack_epoch_rows(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(100 + t))[0]
                 for t in range(T)]

    # ---- serial resident trials (the pinned single-trial path) -------
    serial_params, serial_stats, serial_losses = [], [], []
    for t in range(T):
        st = pack_state(create_train_state(
            model, variables_list[t], optim, wds[t], schedules[t]))
        epoch_fn = make_resident_epoch_fn(model, st, ds.distal_width)
        st, total, _ = epoch_fn(
            st, res.arena, res.y, res.cat, res.cont, res.astart,
            res.neg, jnp.asarray(rows_list[t]), jax.random.key(seeds[t]))
        serial_params.append(np.asarray(st.flat_params))
        serial_stats.append(np.asarray(st.flat_stats))
        serial_losses.append(float(total))

    # ---- one vmapped ensemble epoch at accumulation scale -------------
    # (test_opt_update_matches_optax pins the per-step formulas tight;
    # tighter model-level comparison is impossible because vmap changes
    # gradient reduction order by ulps and Adam's first update is
    # ~sign(g) -- near-zero gradient elements flip to +-lr differences)
    ens = create_ensemble_state(variables_list, optim, wds, schedules,
                                seeds)
    epoch_fn = make_ensemble_epoch_fn(model, ens, ds.distal_width)
    ens, losses = epoch_fn(ens, res.arena, res.y, res.cat, res.cont,
                           res.astart, res.neg,
                           jnp.asarray(np.stack(rows_list)))

    np.testing.assert_allclose(np.asarray(losses), serial_losses,
                               rtol=1e-4)
    if optim == "SGD":
        # strict param equality is only meaningful for SGD: Adam's
        # sign-normalised updates amplify per-step gradient bit noise
        # into genuinely divergent (but statistically equivalent)
        # trajectories -- the same reason the resident-vs-host op test
        # is SGD-only and its trial-level Adam check compares losses
        for t in range(T):
            np.testing.assert_allclose(np.asarray(ens.flat_params[t]),
                                       serial_params[t], rtol=5e-3,
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(ens.flat_stats[t]),
                                       serial_stats[t], rtol=5e-3,
                                       atol=2e-5)

    # ---- ensemble eval matches serial resident eval -------------------
    vrows, vmasks, n_valids = stack_epoch_rows(ds, 3, B, shuffle=False,
                                               pad_final=True)
    eval_fn = make_ensemble_eval_fn(model, ens, ds.distal_width)
    lg_e, vl_e = eval_fn(ens.flat_params, ens.flat_stats, res.arena,
                         res.y, res.cat, res.cont, res.astart, res.neg,
                         jnp.asarray(vrows), jnp.asarray(vmasks))
    st0 = pack_state(create_train_state(
        model, variables_list[0], optim, wds[0], schedules[0]))
    res_eval = make_resident_eval_fn(model, st0, ds.distal_width)
    for t in range(T):
        # the eval fn itself, on IDENTICAL (ensemble-trained) params:
        # must match the single-trial resident eval tight
        lg_s, vl_s = res_eval(
            ens.flat_params[t], ens.flat_stats[t],
            res.arena, res.y, res.cat, res.cont, res.astart, res.neg,
            jnp.asarray(vrows), jnp.asarray(vmasks))
        assert float(vl_e[t]) == pytest.approx(float(vl_s), rel=1e-4)
        np.testing.assert_allclose(np.asarray(lg_e[t]),
                                   np.asarray(lg_s), rtol=1e-3,
                                   atol=1e-4)
        # behavioural equivalence of the trained member vs its serial
        # trial: validation loss at trajectory tolerance (5e-3, the
        # resident-vs-host trial test's bound)
        _, vl_ser = res_eval(
            jnp.asarray(serial_params[t]), jnp.asarray(serial_stats[t]),
            res.arena, res.y, res.cat, res.cont, res.astart, res.neg,
            jnp.asarray(vrows), jnp.asarray(vmasks))
        assert float(vl_e[t]) == pytest.approx(float(vl_ser), rel=5e-3)


def test_ensemble_epoch_bf16_matches_serial_bf16(ds):
    """The bf16 ensemble epoch (the configuration bench.py measures as
    ensemble8_b128_bf16_*) must reproduce each member's own serial
    resident bf16 trial at epoch-loss level.  Tolerance is the repo's
    trajectory bound (5e-3, the resident-vs-host trial tolerance):
    activations are bf16 while optimizer/BN-stats/loss stay f32, and
    vmap's reduction-order noise on ~3-decimal-digit activations is
    amplified by Adam across the epoch (measured 3.4e-3 on one member
    over a 3-segment epoch)."""
    from mural_tpu.models.snv import SNVNet2
    from mural_tpu.train.ensemble import (create_ensemble_state,
                                          make_ensemble_epoch_fn)
    from mural_tpu.train.loop import _init_variables
    from mural_tpu.train.packed import pack_state
    from mural_tpu.train.resident import (make_resident,
                                          make_resident_epoch_fn,
                                          stack_epoch_rows)
    from mural_tpu.train.state import create_train_state

    B, T = 32, 2
    model = SNVNet2(emb_vocab=65, n_cat=ds.cat.shape[1],
                    lin_layer_sizes=[24, 12],
                    emb_dropout=0.0, lin_layer_dropouts=[0.0, 0.0],
                    in_channels=4, out_channels=8, kernel_size=3,
                    distal_fc_dropout=0.0, n_class=4)
    lrs, seeds = [5e-3, 1e-3], [0, 1]
    schedules = [LRSchedule.build("StepLR", lrs[t], 0.9, B, ds.n_sites,
                                  1e-4, 1e-6) for t in range(T)]
    variables_list = [_init_variables(model, ds, s) for s in seeds]
    res = make_resident(ds)
    rows_list = [stack_epoch_rows(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(100 + t))[0]
                 for t in range(T)]

    serial_losses = []
    for t in range(T):
        st = pack_state(create_train_state(
            model, variables_list[t], "Adam", 0.0, schedules[t]))
        epoch_fn = make_resident_epoch_fn(model, st, ds.distal_width,
                                          bf16=True)
        _, total, _ = epoch_fn(
            st, res.arena, res.y, res.cat, res.cont, res.astart,
            res.neg, jnp.asarray(rows_list[t]), jax.random.key(seeds[t]))
        serial_losses.append(float(total))

    ens = create_ensemble_state(variables_list, "Adam", [0.0, 0.0],
                                schedules, seeds)
    epoch_fn = make_ensemble_epoch_fn(model, ens, ds.distal_width,
                                      bf16=True)
    ens, losses = epoch_fn(ens, res.arena, res.y, res.cat, res.cont,
                           res.astart, res.neg,
                           jnp.asarray(np.stack(rows_list)))
    assert np.isfinite(np.asarray(losses)).all()
    np.testing.assert_allclose(np.asarray(losses), serial_losses,
                               rtol=5e-3)


def test_live_mask_freezes_member(ds):
    """A member with live=0 must hold params, optimizer state and BN
    stats through an epoch while live members keep training."""
    from mural_tpu.models.snv import SNVNet2
    from mural_tpu.train.ensemble import (create_ensemble_state,
                                          make_ensemble_epoch_fn)
    from mural_tpu.train.loop import _init_variables
    from mural_tpu.train.resident import make_resident, stack_epoch_rows

    B, T = 32, 2
    model = SNVNet2(emb_vocab=65, n_cat=ds.cat.shape[1],
                    lin_layer_sizes=[24, 12],
                    emb_dropout=0.0, lin_layer_dropouts=[0.0, 0.0],
                    in_channels=4, out_channels=8, kernel_size=3,
                    distal_fc_dropout=0.0, n_class=4)
    schedules = [LRSchedule.build("StepLR", 5e-3, 0.9, B, ds.n_sites,
                                  1e-4, 1e-6)] * T
    variables_list = [_init_variables(model, ds, s) for s in (0, 1)]
    ens = create_ensemble_state(variables_list, "Adam", [0.0, 0.0],
                                schedules, [0, 1])
    ens = ens.replace(live=jnp.asarray([1.0, 0.0]))
    p_before = np.asarray(ens.flat_params).copy()
    s_before = np.asarray(ens.flat_stats).copy()

    res = make_resident(ds)
    rows = np.stack([stack_epoch_rows(ds, 3, B, shuffle=True,
                                      rng=np.random.default_rng(i))[0]
                     for i in range(T)])
    epoch_fn = make_ensemble_epoch_fn(model, ens, ds.distal_width)
    ens, losses = epoch_fn(ens, res.arena, res.y, res.cat, res.cont,
                           res.astart, res.neg, jnp.asarray(rows))
    assert np.isfinite(np.asarray(losses)).all()
    p_after = np.asarray(ens.flat_params)
    s_after = np.asarray(ens.flat_stats)
    assert not np.allclose(p_after[0], p_before[0])   # live trains
    np.testing.assert_array_equal(p_after[1], p_before[1])
    np.testing.assert_array_equal(s_after[1], s_before[1])
    mu = np.asarray(ens.opt["mu"])
    assert np.array_equal(mu[1], np.zeros_like(mu[1]))


def test_group_signature_and_eligibility():
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.ensemble import (ensemble_eligible,
                                         group_signature, group_trials)

    base = dict(batch_size=32, optim="Adam", learning_rate=1e-3,
                weight_decay=0.0, LR_gamma=0.9, CNN_out_channels=8,
                transfer_learning=False, sampled_segments=10)
    a = dict(base, learning_rate=5e-3, weight_decay=1e-4,
             sampled_segments=5)
    b = dict(base, batch_size=64)          # different program shape
    assert group_signature(base) == group_signature(a)
    assert group_signature(base) != group_signature(b)
    groups = group_trials([("t0", base), ("t1", a), ("t2", b)])
    assert [len(g) for g in groups] == [2, 1]

    opts = TrainOptions(train_data="x", ref_genome="y")
    assert ensemble_eligible(base, opts)
    assert not ensemble_eligible(dict(base, transfer_learning=True),
                                 opts)
    import dataclasses
    assert not ensemble_eligible(
        base, dataclasses.replace(opts, resident="off"))
    assert not ensemble_eligible(
        base, dataclasses.replace(opts, dp_devices=2))


def test_run_experiment_ensemble_matches_off(tiny_genome, tiny_bed,
                                             tmp_path):
    """Runner-level equivalence: the same experiment seed must produce
    the same per-trial results whether trials run serially or as one
    vmapped ensemble (members differ in sampled learning rate and
    weight decay)."""
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment

    space = dict(
        local_radius=3, local_order=2, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=16, local_hidden2_size=4,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam",
        learning_rate=LogUniform(1e-3, 1e-2), lr_scheduler="StepLR",
        LR_gamma=Choice([0.9, 0.8]),
        weight_decay=LogUniform(1e-6, 1e-4), weight_decay_auto=None,
        restart_lr=1e-4, min_lr=1e-6, CNN_kernel_size=3,
        CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)

    losses = {}
    for mode in ("off", "auto"):
        exp = ExperimentOptions(
            experiment_name=f"ens_{mode}", results_dir=str(tmp_path),
            n_trials=3, epochs=2, grace_period=3, use_scheduler=True,
            seed=7, ensemble=mode)
        best = run_experiment(space, opts, "snv", exp,
                              printer=lambda *a: None)
        assert len(best) == 3
        losses[mode] = sorted(loss for _, loss in best)
        exp_dir = os.path.join(str(tmp_path), f"ens_{mode}")
        for trial in os.listdir(exp_dir):
            if trial.startswith("Train_"):
                tdir = os.path.join(exp_dir, trial)
                assert os.path.exists(
                    os.path.join(tdir, "progress.csv"))
                assert os.path.exists(
                    os.path.join(tdir, "checkpoint_1", "model"))
                assert os.path.exists(
                    os.path.join(tdir, "checkpoint_1",
                                 "model.config.pkl"))
    # same sampled configs + seeds -> same trajectories (Adam bit-noise
    # tolerance, as in the resident-vs-host trial test)
    np.testing.assert_allclose(losses["auto"], losses["off"], rtol=5e-3)


def test_ensemble_checkpoint_predicts(tiny_genome, tiny_bed, tmp_path):
    """A checkpoint written by an ensemble member must be loadable by
    the ordinary predict pipeline (triple layout, self-describing
    config with the member's sampled values)."""
    import pickle

    from mural_tpu.predict import PredictOptions, run_predict
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment

    space = dict(
        local_radius=3, local_order=2, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=16, local_hidden2_size=4,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam",
        learning_rate=LogUniform(1e-3, 1e-2), lr_scheduler="StepLR",
        LR_gamma=0.9, weight_decay=0.0, weight_decay_auto=None,
        restart_lr=1e-4, min_lr=1e-6, CNN_kernel_size=3,
        CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    exp = ExperimentOptions(
        experiment_name="ens_ckpt", results_dir=str(tmp_path),
        n_trials=2, epochs=1, grace_period=2, use_scheduler=True,
        seed=3, ensemble="auto")
    best = run_experiment(space, opts, "snv", exp,
                          printer=lambda *a: None)
    ckpt = os.path.dirname(best[0][0])
    with open(os.path.join(ckpt, "model.config.pkl"), "rb") as fh:
        cfg = pickle.load(fh)
    assert "learning_rate" in cfg and "emb_dims" in cfg
    popts = PredictOptions(
        test_data=tiny_bed, ref_genome=tiny_genome["path"],
        model_path=os.path.join(ckpt, "model"),
        model_config_path=os.path.join(ckpt, "model.config.pkl"),
        calibrator_path=os.path.join(ckpt, "model.fdiri_cal.pkl"),
        pred_file="", pred_batch_size=64)
    df = run_predict(popts, "snv", printer=lambda *a: None)
    probs = df[[f"prob{i}" for i in range(4)]].to_numpy()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_run_experiment_ensemble_indel(tiny_genome, tiny_bed, tmp_path):
    """The ensemble path is model-family-agnostic: an INDEL U-Net group
    must train, checkpoint and report like SNV (cat/cont present in the
    resident arrays but unused by the model)."""
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment

    space = dict(
        local_radius=3, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=50, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam",
        learning_rate=LogUniform(1e-3, 1e-2), lr_scheduler="StepLR2",
        LR_gamma=0.98, weight_decay=0.01, weight_decay_auto=None,
        restart_lr=1e-4, min_lr=1e-6, CNN_kernel_size=3,
        CNN_out_channels=4, down_list=[1, 2, 5, 5, 2, 1],
        use_reverse=False, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=0, valid_ratio=0.25, split_seed=1)
    exp = ExperimentOptions(
        experiment_name="ens_indel", results_dir=str(tmp_path),
        n_trials=2, epochs=1, grace_period=2, use_scheduler=True,
        seed=11, ensemble="auto")
    best = run_experiment(space, opts, "indel", exp,
                          printer=lambda *a: None)
    assert len(best) == 2
    for path, loss in best:
        assert os.path.exists(path)
        assert np.isfinite(loss)


def test_ensemble_groups_across_devices(tiny_genome, tiny_bed,
                                        tmp_path):
    """Two program-shape groups (different batch sizes) dispatched
    concurrently to two virtual devices (--n_parallel 2): all four
    trials finish with checkpoints, groups keyed by batch size."""
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment

    space = dict(
        local_radius=3, local_order=2, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=16, local_hidden2_size=4,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=Choice([32, 48]), optim="Adam",
        learning_rate=LogUniform(1e-3, 1e-2), lr_scheduler="StepLR",
        LR_gamma=0.9, weight_decay=0.0, weight_decay_auto=None,
        restart_lr=1e-4, min_lr=1e-6, CNN_kernel_size=3,
        CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    exp = ExperimentOptions(
        experiment_name="ens_multi", results_dir=str(tmp_path),
        n_trials=4, epochs=1, grace_period=2, use_scheduler=True,
        seed=6, n_parallel=2, ensemble="auto")   # seed 6 -> 2+2 split
    best = run_experiment(space, opts, "snv", exp,
                          printer=lambda *a: None)
    assert len(best) == 4
    assert all(os.path.exists(p) for p, _ in best)
