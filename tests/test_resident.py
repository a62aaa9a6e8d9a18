"""Device-resident training path: arena build, strand trick, and
epoch-for-epoch equivalence with the host-fed packed step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mural_tpu.data.batcher import segment_pool_batches
from mural_tpu.data.dataset import prepare_dataset
from mural_tpu.genome import encode as enc
from mural_tpu.train.resident import (build_arena, make_resident,
                                      make_resident_epoch_fn,
                                      make_resident_eval_fn,
                                      stack_epoch_rows)


@pytest.fixture(scope="module")
def ds(tiny_genome, tiny_bed):
    return prepare_dataset(tiny_bed, tiny_genome["path"],
                           central_bp=10_000, local_radius=4,
                           local_order=3, distal_radius=25,
                           model_type="snv")


def test_arena_matches_gather_windows(ds):
    """arena[astart[i] : +dw] must equal the forward-strand host gather
    for every site, including N-fill past chromosome edges (chrM sites
    sit within 600bp of both ends)."""
    arena, astart = build_arena(ds)
    dw = ds.distal_width
    gstart = enc.expanded_start(ds.start, ds.distal_radius, ds.model_type)
    no_flip = np.zeros(ds.n_sites, dtype=bool)
    for cid in np.unique(ds.chrom_id):
        m = np.where(ds.chrom_id == cid)[0]
        want = enc.gather_windows(ds.chrom_codes[cid], gstart[m], dw,
                                  no_flip[m])
        got = np.stack([arena[astart[i]:astart[i] + dw] for i in m])
        np.testing.assert_array_equal(got, want)


def test_arena_is_compact(ds):
    """The arena must not exceed the merged-window union (i.e. shared
    overlap is actually shared, the reference's preprocessing.py:571-615
    optimisation)."""
    arena, _ = build_arena(ds)
    total_span = sum(len(c) for c in ds.chrom_codes)
    assert len(arena) <= total_span + 4 * ds.distal_width
    assert len(arena) < ds.n_sites * ds.distal_width  # overlap shared


def test_onehot_revcomp_trick(ds):
    """one_hot(revcomp(codes)) == one_hot(codes)[::-1 on L, ::-1 on C]
    bit-for-bit for every IUPAC code (the in-graph strand resolution)."""
    from mural_tpu.models.layers import one_hot_from_codes

    codes = np.arange(15, dtype=np.uint8)   # every IUPAC code incl. N
    # widen past the array so the N_CODE out-of-genome fill is hit too
    fwd = enc.gather_windows(codes, np.full(1, -2, np.int64), 19,
                             np.array([False]))
    rc = enc.gather_windows(codes, np.full(1, -2, np.int64), 19,
                            np.array([True]))
    oh_f = np.asarray(one_hot_from_codes(jnp.asarray(fwd)))
    oh_rc = np.asarray(one_hot_from_codes(jnp.asarray(rc)))
    np.testing.assert_array_equal(oh_rc, oh_f[:, ::-1, ::-1])


def test_stack_epoch_rows_matches_batcher(ds):
    rows, masks, n_valids = stack_epoch_rows(
        ds, 3, 32, shuffle=True, rng=np.random.default_rng(5))
    want = [b.rows for b in segment_pool_batches(
        ds, 3, 32, shuffle=True, rng=np.random.default_rng(5))]
    assert rows.shape[0] == len(want)
    for i, w in enumerate(want):
        np.testing.assert_array_equal(rows[i], np.where(w < 0, 0, w))
    assert (masks == 1.0).all()


def test_resident_epoch_matches_host_steps(ds):
    """A one-dispatch resident epoch must reproduce the host-fed packed
    step trajectory batch for batch: same losses, same final params.

    SGD keeps the comparison tight: step-1 losses are bit-equal (the
    input paths are bit-identical), but the scan-body program fuses
    reductions differently from the standalone step, and Adam's
    sign-normalised first update would amplify that bit-noise to
    +-lr-sized parameter differences (see
    test_single_step_logits_match_torch_tight)."""
    from mural_tpu.models.snv import SNVNet2
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.packed import (make_packed_eval_step,
                                        make_packed_train_step,
                                        pack_state)
    from mural_tpu.train.state import create_train_state

    B = 32
    model = SNVNet2(emb_vocab=65, n_cat=ds.cat.shape[1],
                    lin_layer_sizes=[24, 12],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=8, kernel_size=3,
                    distal_fc_dropout=0.1, n_class=4)
    cat0 = jnp.asarray(ds.cat[:2].astype(np.int32))
    oh0 = jnp.zeros((2, ds.distal_width, 4), jnp.float32)
    variables = model.init(jax.random.key(0), cat0, None, oh0, False)
    sched = LRSchedule.build("StepLR", 5e-3, 0.9, B, ds.n_sites,
                             1e-4, 1e-6)

    def fresh_state():
        return pack_state(create_train_state(
            model, variables, "SGD", 0.0, sched))

    base_rng = jax.random.key(3)

    # ---- host path ---------------------------------------------------
    state_h = fresh_state()
    step = make_packed_train_step(model, state_h, donate=False)
    host_losses = []
    for b in segment_pool_batches(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(11)):
        state_h, loss, _ = step(
            state_h, jnp.asarray(b.y), jnp.asarray(b.cat), None,
            jnp.asarray(b.distal),
            jnp.full(B, 1.0, jnp.float32), base_rng)
        host_losses.append(float(loss))

    # ---- resident path ----------------------------------------------
    res = make_resident(ds)
    state_r = fresh_state()
    epoch_fn = make_resident_epoch_fn(model, state_r, ds.distal_width)
    rows, _, _ = stack_epoch_rows(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(11))
    state_r, total_loss, _ = epoch_fn(
        state_r, res.arena, res.y, res.cat, res.cont, res.astart,
        res.neg, jnp.asarray(rows), base_rng)

    assert float(total_loss) == pytest.approx(sum(host_losses),
                                              rel=1e-5)
    np.testing.assert_allclose(np.asarray(state_r.flat_params),
                               np.asarray(state_h.flat_params),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_r.flat_stats),
                               np.asarray(state_h.flat_stats),
                               rtol=2e-5, atol=1e-6)

    # ---- resident eval matches host eval -----------------------------
    eval_host = make_packed_eval_step(model, state_h)
    logits_h, vloss_h = [], 0.0
    for b in segment_pool_batches(ds, 3, B, shuffle=False,
                                  pad_final=True):
        lg, vl = eval_host(state_h.flat_params, state_h.flat_stats,
                           jnp.asarray(b.y), jnp.asarray(b.cat), None,
                           jnp.asarray(b.distal),
                           jnp.asarray((np.arange(B) < b.n_valid)
                                       .astype(np.float32)))
        logits_h.append(np.asarray(lg)[:b.n_valid])
        vloss_h += float(vl)
    logits_h = np.concatenate(logits_h)

    eval_fn = make_resident_eval_fn(model, state_r, ds.distal_width)
    vrows, vmasks, n_valids = stack_epoch_rows(ds, 3, B, shuffle=False,
                                               pad_final=True)
    lg_r, vloss_r = eval_fn(state_r.flat_params, state_r.flat_stats,
                            res.arena, res.y, res.cat, res.cont,
                            res.astart, res.neg, jnp.asarray(vrows),
                            jnp.asarray(vmasks))
    lg_r = np.concatenate([np.asarray(lg_r)[i, :n]
                           for i, n in enumerate(n_valids)])
    assert float(vloss_r) == pytest.approx(vloss_h, rel=1e-5)
    np.testing.assert_allclose(lg_r, logits_h, rtol=2e-5, atol=1e-6)


def test_train_trial_resident_matches_host(tiny_genome, tiny_bed,
                                           tmp_path_factory):
    """Full train_trial with the resident path vs the host-fed path:
    same seeds, same split -- validation losses must agree to Adam
    bit-noise tolerance (the per-step math is identical; only XLA
    program fusion differs)."""
    from mural_tpu.train.loop import TrainOptions, train_trial

    config = dict(
        local_radius=3, local_order=2, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=24, local_hidden2_size=12,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8,
        transfer_learning=False,
    )

    losses = {}
    for mode in ("on", "off"):
        trial_dir = str(tmp_path_factory.mktemp(f"res_{mode}"))
        opts = TrainOptions(
            train_data=tiny_bed, ref_genome=tiny_genome["path"],
            n_class=4, model_no=2, epochs=2, valid_ratio=0.2,
            split_seed=42, grace_period=5, trial_dir=trial_dir,
            rng_seed=0, resident=mode)
        losses[mode] = train_trial(dict(config), opts, "snv")["loss"]

    assert losses["on"] == pytest.approx(losses["off"], rel=5e-3)


def test_train_trial_with_validation_file_overlap(tiny_genome, tiny_bed,
                                                  tmp_path):
    """validation_data path: the validation encode runs on a worker
    overlapped with the epoch-0 warm-compile; results must be sane and
    the resident path engaged."""
    from mural_tpu.train.loop import TrainOptions, train_trial

    # the training bed doubles as the validation file (separate arg)
    config = dict(
        local_radius=3, local_order=2, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=24, local_hidden2_size=12,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8,
        transfer_learning=False,
    )
    logs = []
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        validation_data=tiny_bed, n_class=4, model_no=2, epochs=1,
        grace_period=5, trial_dir=str(tmp_path / "trial"), rng_seed=0,
        resident="on")
    import mural_tpu.train.loop as L
    real_printer = L.get_printer
    try:
        L.get_printer = lambda *a, **k: (
            lambda *args, **kw: logs.append(" ".join(str(x)
                                                     for x in args)))
        metrics = train_trial(config, opts, "snv")
    finally:
        L.get_printer = real_printer
    assert np.isfinite(metrics["loss"])
    joined = "\n".join(logs)
    assert "validation preprocess ran on a worker" in joined
    assert "warm-compiled" in joined
    assert "device-resident data" in joined


def test_resident_epoch_mesh_matches_single_device(ds):
    """Mesh-sharded resident epochs (loop.py `--dp_devices` + resident)
    must reproduce the single-device resident trajectory: same summed
    loss, same final params/stats, same eval logits.  The mesh variant
    replicates state/resident arrays and shards the row array on its
    batch axis; XLA inserts the per-step all-reduces.  SGD keeps the
    comparison tight (see test_resident_epoch_matches_host_steps)."""
    from mural_tpu.models.snv import SNVNet2
    from mural_tpu.parallel.mesh import (make_mesh, replicated,
                                         stacked_batch_sharding)
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.packed import pack_state
    from mural_tpu.train.state import create_train_state

    n_dev = 4
    if jax.device_count() < n_dev:
        pytest.skip("needs >= 4 virtual devices")
    B = 32                                 # 8 rows per device
    model = SNVNet2(emb_vocab=65, n_cat=ds.cat.shape[1],
                    lin_layer_sizes=[24, 12],
                    emb_dropout=0.1, lin_layer_dropouts=[0.1, 0.1],
                    in_channels=4, out_channels=8, kernel_size=3,
                    distal_fc_dropout=0.1, n_class=4)
    cat0 = jnp.asarray(ds.cat[:2].astype(np.int32))
    oh0 = jnp.zeros((2, ds.distal_width, 4), jnp.float32)
    variables = model.init(jax.random.key(0), cat0, None, oh0, False)
    sched = LRSchedule.build("StepLR", 5e-3, 0.9, B, ds.n_sites,
                             1e-4, 1e-6)

    def fresh_state():
        return pack_state(create_train_state(
            model, variables, "SGD", 0.0, sched))

    base_rng = jax.random.key(3)
    res = make_resident(ds)
    rows, _, _ = stack_epoch_rows(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(11))

    # ---- single device ------------------------------------------------
    state_1 = fresh_state()
    epoch_1 = make_resident_epoch_fn(model, state_1, ds.distal_width)
    state_1, loss_1, _ = epoch_1(
        state_1, res.arena, res.y, res.cat, res.cont, res.astart,
        res.neg, jnp.asarray(rows), base_rng)

    # ---- mesh ---------------------------------------------------------
    mesh = make_mesh(n_dev)
    rep = replicated(mesh)
    rows_sh = stacked_batch_sharding(mesh)
    res_m = make_resident(ds, device=rep)
    state_m = jax.device_put(fresh_state(), rep)
    epoch_m = make_resident_epoch_fn(model, state_m, ds.distal_width,
                                     mesh=mesh)
    state_m, loss_m, _ = epoch_m(
        state_m, res_m.arena, res_m.y, res_m.cat, res_m.cont,
        res_m.astart, res_m.neg, jax.device_put(rows, rows_sh),
        jax.device_put(base_rng, rep))

    assert float(loss_m) == pytest.approx(float(loss_1), rel=1e-5)
    # per-shard partial sums + psum reorder f32 reductions vs the
    # single-device program: measured absmax 2.3e-6 (params) / 6.1e-6
    # (stats) after 12 SGD steps; atol 1e-5 keeps ~4x margin
    np.testing.assert_allclose(np.asarray(state_m.flat_params),
                               np.asarray(state_1.flat_params),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_m.flat_stats),
                               np.asarray(state_1.flat_stats),
                               rtol=2e-5, atol=1e-5)

    # ---- sharded eval matches single-device eval ----------------------
    vrows, vmasks, n_valids = stack_epoch_rows(ds, 3, B, shuffle=False,
                                               pad_final=True)
    eval_1 = make_resident_eval_fn(model, state_1, ds.distal_width)
    lg_1, vloss_1 = eval_1(state_1.flat_params, state_1.flat_stats,
                           res.arena, res.y, res.cat, res.cont,
                           res.astart, res.neg, jnp.asarray(vrows),
                           jnp.asarray(vmasks))
    eval_m = make_resident_eval_fn(model, state_m, ds.distal_width,
                                   mesh=mesh)
    lg_m, vloss_m = eval_m(state_m.flat_params, state_m.flat_stats,
                           res_m.arena, res_m.y, res_m.cat, res_m.cont,
                           res_m.astart, res_m.neg,
                           jax.device_put(vrows, rows_sh),
                           jax.device_put(vmasks, rows_sh))
    assert float(vloss_m) == pytest.approx(float(vloss_1), rel=1e-5)
    np.testing.assert_allclose(np.asarray(lg_m), np.asarray(lg_1),
                               rtol=2e-5, atol=1e-5)


def test_train_trial_resident_dp_matches_single(tiny_genome, tiny_bed,
                                                tmp_path):
    """Full train_trial: resident + --dp_devices 4 must match resident
    single-device losses (loop.py composition of the two paths).

    One epoch at rel=5e-3, the same trajectory tolerance as
    test_train_trial_resident_matches_host: per-step equivalence is
    pinned tight by test_resident_epoch_mesh_matches_single_device;
    across a whole trial the psum reduction reordering (~1e-6) chaos-
    amplifies through BatchNorm running stats (measured 6e-4 on the
    epoch-0 validation loss here)."""
    from mural_tpu.train.loop import TrainOptions, train_trial

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 virtual devices")

    config = dict(
        local_radius=4, local_order=2, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=24, local_hidden2_size=12,
        distal_radius=30, segment_center=10_000,
        sampled_segments=3, batch_size=32, optim="SGD",
        learning_rate=5e-3, lr_scheduler="StepLR", LR_gamma=0.9,
        weight_decay=0.0, weight_decay_auto=None, restart_lr=1e-4,
        min_lr=1e-6, CNN_kernel_size=3, CNN_out_channels=8,
        transfer_learning=False)

    losses = {}
    for dp in (1, 4):
        opts = TrainOptions(
            train_data=tiny_bed, ref_genome=tiny_genome["path"],
            n_class=4, model_no=2, epochs=1, valid_ratio=0.2,
            split_seed=7, trial_dir=str(tmp_path / f"dp{dp}"),
            rng_seed=0, dp_devices=dp, resident="on")
        m = train_trial(config, opts, "snv")
        losses[dp] = m["loss"]
    assert losses[4] == pytest.approx(losses[1], rel=5e-3)


def test_resident_epoch_matches_host_steps_indel(tiny_genome, tiny_bed):
    """The resident path is model-family-agnostic: an INDEL U-Net epoch
    (gap-anchored 2r windows, `cat` present but unused by the model,
    ref model_indel.py:21-179) must reproduce the host-fed packed-step
    trajectory just like the SNV test above.  SGD keeps it tight."""
    from mural_tpu.models.indel import UNetSmall
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.packed import (make_packed_eval_step,
                                        make_packed_train_step,
                                        pack_state)
    from mural_tpu.train.state import create_train_state

    ids = prepare_dataset(tiny_bed, tiny_genome["path"],
                          central_bp=10_000, local_radius=3,
                          local_order=1, distal_radius=50,
                          model_type="indel")
    assert ids.distal_width == 100
    B = 32
    model = UNetSmall(n_class=4, out_channels=4, kernel_size=3,
                      downsize=(1, 2, 5, 5, 2, 1))
    oh0 = jnp.zeros((2, ids.distal_width, 4), jnp.float32)
    variables = model.init(jax.random.key(0), None, None, oh0, False)
    sched = LRSchedule.build("StepLR", 5e-3, 0.9, B, ids.n_sites,
                             1e-4, 1e-6)

    def fresh_state():
        return pack_state(create_train_state(
            model, variables, "SGD", 0.0, sched))

    base_rng = jax.random.key(3)

    # ---- host path ---------------------------------------------------
    state_h = fresh_state()
    step = make_packed_train_step(model, state_h, donate=False)
    host_losses = []
    for b in segment_pool_batches(ids, 3, B, shuffle=True,
                                  rng=np.random.default_rng(11)):
        state_h, loss, _ = step(
            state_h, jnp.asarray(b.y), jnp.asarray(b.cat), None,
            jnp.asarray(b.distal),
            jnp.full(B, 1.0, jnp.float32), base_rng)
        host_losses.append(float(loss))

    # ---- resident path ----------------------------------------------
    res = make_resident(ids)
    state_r = fresh_state()
    epoch_fn = make_resident_epoch_fn(model, state_r, ids.distal_width)
    rows, _, _ = stack_epoch_rows(ids, 3, B, shuffle=True,
                                  rng=np.random.default_rng(11))
    state_r, total_loss, _ = epoch_fn(
        state_r, res.arena, res.y, res.cat, res.cont, res.astart,
        res.neg, jnp.asarray(rows), base_rng)

    assert float(total_loss) == pytest.approx(sum(host_losses),
                                              rel=1e-5)
    np.testing.assert_allclose(np.asarray(state_r.flat_params),
                               np.asarray(state_h.flat_params),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_r.flat_stats),
                               np.asarray(state_h.flat_stats),
                               rtol=2e-5, atol=1e-6)

    # ---- resident eval matches host eval -----------------------------
    eval_host = make_packed_eval_step(model, state_h)
    logits_h, vloss_h = [], 0.0
    for b in segment_pool_batches(ids, 3, B, shuffle=False,
                                  pad_final=True):
        lg, vl = eval_host(state_h.flat_params, state_h.flat_stats,
                           jnp.asarray(b.y), jnp.asarray(b.cat), None,
                           jnp.asarray(b.distal),
                           jnp.asarray((np.arange(B) < b.n_valid)
                                       .astype(np.float32)))
        logits_h.append(np.asarray(lg)[:b.n_valid])
        vloss_h += float(vl)
    logits_h = np.concatenate(logits_h)

    eval_fn = make_resident_eval_fn(model, state_r, ids.distal_width)
    vrows, vmasks, n_valids = stack_epoch_rows(ids, 3, B, shuffle=False,
                                               pad_final=True)
    lg_r, vloss_r = eval_fn(state_r.flat_params, state_r.flat_stats,
                            res.arena, res.y, res.cat, res.cont,
                            res.astart, res.neg, jnp.asarray(vrows),
                            jnp.asarray(vmasks))
    lg_r = np.concatenate([np.asarray(lg_r)[i, :n]
                           for i, n in enumerate(n_valids)])
    assert float(vloss_r) == pytest.approx(vloss_h, rel=1e-5)
    np.testing.assert_allclose(lg_r, logits_h, rtol=2e-5, atol=1e-6)


def test_resident_auto_valid_budget_fallback(tiny_genome, rng,
                                             tmp_path):
    """Auto mode budgets 2x the train estimate while the validation
    file is still preprocessing; once the real validation dataset is
    known, a validation set that blows the budget must fall back to
    host-fed batches instead of uploading (and risking a device OOM)."""
    from conftest import make_bed

    from mural_tpu.data.dataset import prepare_dataset
    from mural_tpu.train.loop import TrainOptions, train_trial
    from mural_tpu.train.resident import estimate_resident_bytes

    train_bed = str(tmp_path / "train.sorted.bed")
    valid_bed = str(tmp_path / "valid.sorted.bed")
    make_bed(train_bed, tiny_genome["seqs"], rng, n_sites=80,
             chroms=("chr1",))
    make_bed(valid_bed, tiny_genome["seqs"], rng, n_sites=600,
             chroms=("chr1",))

    kw = dict(central_bp=5000, local_radius=3, local_order=2,
              distal_radius=60, model_type="snv")
    est_train = estimate_resident_bytes(
        prepare_dataset(train_bed, tiny_genome["path"], **kw))
    est_valid = estimate_resident_bytes(
        prepare_dataset(valid_bed, tiny_genome["path"], **kw))
    assert est_valid > est_train          # construction precondition
    # passes the pre-join 2x-train gate, fails the real train+valid sum
    budget = (2 * est_train + est_train + est_valid) // 2
    assert 2 * est_train <= budget < est_train + est_valid

    config = dict(
        local_radius=3, local_order=2, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=24, local_hidden2_size=12,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8,
        transfer_learning=False,
    )
    logs = []
    opts = TrainOptions(
        train_data=train_bed, ref_genome=tiny_genome["path"],
        validation_data=valid_bed, n_class=4, model_no=2, epochs=1,
        grace_period=5, trial_dir=str(tmp_path / "trial"), rng_seed=0,
        resident="auto", resident_max_bytes=int(budget))
    import mural_tpu.train.loop as L
    real_printer = L.get_printer
    try:
        L.get_printer = lambda *a, **k: (
            lambda *args, **kw_: logs.append(" ".join(str(x)
                                                      for x in args)))
        metrics = train_trial(config, opts, "snv")
    finally:
        L.get_printer = real_printer
    assert np.isfinite(metrics["loss"])
    joined = "\n".join(logs)
    assert "validation set exceeds the budget" in joined
    assert "one dispatch per epoch" not in joined
