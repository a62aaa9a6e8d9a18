"""ASHA scheduler, search-space sampling, trial runner, dataset cache,
and extra calibrators."""
import os

import numpy as np
import pytest

from mural_tpu.tune.asha import ASHAScheduler
from mural_tpu.tune.space import (Choice, LogUniform, SampleFrom,
                                  loguniform_or_choice, sample_config)


def test_sample_config():
    space = {
        "a": Choice([1, 2, 3]),
        "lr": LogUniform(1e-4, 1e-2),
        "h2": SampleFrom(lambda c: c["a"] * 10),
        "fixed": "x",
    }
    rng = np.random.default_rng(0)
    for _ in range(10):
        c = sample_config(space, rng)
        assert c["a"] in (1, 2, 3)
        assert 1e-4 <= c["lr"] <= 1e-2
        assert c["h2"] == c["a"] * 10
        assert c["fixed"] == "x"
    assert loguniform_or_choice([0.1]) == 0.1
    assert isinstance(loguniform_or_choice([1e-4, 1e-2]), LogUniform)


def test_asha_promotion():
    # grace 2, rf 2, max 8 -> rungs at 2, 4
    s = ASHAScheduler(metric="loss", max_t=8, grace_period=2,
                      reduction_factor=2)
    assert s.rungs == [2, 4]
    # trial A reports loss 1.0 at rung 2: only result -> continues
    assert s.on_report("A", 2, {"loss": 1.0})
    # trial B with a better loss continues; A's 1.0 becomes the cutoff
    assert s.on_report("B", 2, {"loss": 0.5})
    # trial C worse than the median-ish cutoff -> stopped
    assert not s.on_report("C", 2, {"loss": 2.0})
    # non-rung iterations never stop
    assert s.on_report("D", 3, {"loss": 100.0})


@pytest.mark.slow
def test_run_experiment_end_to_end(tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment

    space = dict(
        local_radius=Choice([2, 3]), local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=Choice([8, 16]), local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam",
        learning_rate=LogUniform(1e-3, 1e-2), lr_scheduler="StepLR",
        LR_gamma=0.9, weight_decay=0.0, weight_decay_auto=None,
        restart_lr=1e-4, min_lr=1e-6, CNN_kernel_size=3,
        CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    exp = ExperimentOptions(experiment_name="exp1",
                            results_dir=str(tmp_path), n_trials=2,
                            epochs=1, grace_period=2,
                            use_scheduler=True, seed=5)
    best = run_experiment(space, opts, "snv", exp,
                          printer=lambda *a: None)
    assert len(best) == 2
    assert all(os.path.exists(p) for p, _ in best)
    assert os.path.exists(tmp_path / "exp1" / "best_models.txt")
    # progress.csv written for each trial
    for trial in os.listdir(tmp_path / "exp1"):
        if trial.startswith("Train_"):
            assert os.path.exists(tmp_path / "exp1" / trial /
                                  "progress.csv")


def test_dataset_cache_roundtrip(tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.data.cache import (cache_path, is_cache_fresh,
                                      prepare_dataset_cached)
    from mural_tpu.data.dataset import prepare_dataset

    kwargs = dict(central_bp=5000, local_radius=3, local_order=2,
                  distal_radius=30, model_type="snv")
    ds0 = prepare_dataset(tiny_bed, tiny_genome["path"], **kwargs)
    ds1 = prepare_dataset_cached(tiny_bed, tiny_genome["path"],
                                 5000, 3, 2, 30, "snv",
                                 cache_dir=str(tmp_path),
                                 printer=lambda *a: None)
    path = cache_path(tiny_bed, 5000, 3, 2, 30, "snv", str(tmp_path))
    assert os.path.exists(path)
    assert is_cache_fresh(path, tiny_bed)
    ds2 = prepare_dataset_cached(tiny_bed, tiny_genome["path"],
                                 5000, 3, 2, 30, "snv",
                                 cache_dir=str(tmp_path),
                                 printer=lambda *a: None)
    for a, b in [(ds0, ds1), (ds1, ds2)]:
        assert np.array_equal(a.cat, b.cat)
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.seg_offsets, b.seg_offsets)
        assert np.array_equal(a.local1, b.local1)
    # distal gathers agree (cache stores no distal data)
    rows = np.arange(min(20, ds0.n_sites))
    assert np.array_equal(ds0.gather_distal(rows), ds2.gather_distal(rows))


def test_dataset_cache_sharded(tiny_genome, tiny_bed, tmp_path):
    """--n_h5_files > 1: row-sharded parallel cache write (the TPU-native
    analogue of ref ExternalLink sharding, preprocessing.py:319-353).
    The sharded cache must load back identical to the single-file one,
    and staleness must trip when any shard goes missing or stale."""
    import glob

    from mural_tpu.data.cache import (cache_path, is_cache_fresh,
                                      prepare_dataset_cached)
    from mural_tpu.data.dataset import prepare_dataset

    kwargs = dict(central_bp=5000, local_radius=3, local_order=2,
                  distal_radius=30, model_type="snv")
    ds0 = prepare_dataset(tiny_bed, tiny_genome["path"], **kwargs)
    ds1 = prepare_dataset_cached(tiny_bed, tiny_genome["path"],
                                 5000, 3, 2, 30, "snv",
                                 cache_dir=str(tmp_path),
                                 printer=lambda *a: None, n_files=4)
    path = cache_path(tiny_bed, 5000, 3, 2, 30, "snv", str(tmp_path))
    shards = sorted(glob.glob(path + ".part*"))
    assert len(shards) == 4
    assert is_cache_fresh(path, tiny_bed)
    # cache-hit load reassembles the shards
    ds2 = prepare_dataset_cached(tiny_bed, tiny_genome["path"],
                                 5000, 3, 2, 30, "snv",
                                 cache_dir=str(tmp_path),
                                 printer=lambda *a: None, n_files=4)
    for a, b in [(ds0, ds1), (ds0, ds2)]:
        assert np.array_equal(a.cat, b.cat)
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.seg_offsets, b.seg_offsets)
        assert np.array_equal(a.local1, b.local1)
    rows = np.arange(min(20, ds0.n_sites))
    assert np.array_equal(ds0.gather_distal(rows), ds2.gather_distal(rows))
    # a missing shard invalidates the whole cache
    os.remove(shards[2])
    assert not is_cache_fresh(path, tiny_bed)
    # regeneration heals it (master written last, so a fresh master
    # implies complete shards)
    prepare_dataset_cached(tiny_bed, tiny_genome["path"],
                           5000, 3, 2, 30, "snv",
                           cache_dir=str(tmp_path),
                           printer=lambda *a: None, n_files=4)
    assert is_cache_fresh(path, tiny_bed)


def test_extra_calibrators():
    from mural_tpu.calibrate.extra import (DiagDirichlet,
                                           DirichletCalibrator,
                                           FixedDiagDirichlet,
                                           MatrixScaling)
    from mural_tpu.calibrate.metrics import nll_from_probs
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(800, 3)) * 2
    e = np.exp(logits - logits.max(1, keepdims=True))
    true_probs = e / e.sum(1, keepdims=True)
    y = np.array([rng.choice(3, p=p) for p in true_probs])
    probs = e ** 0.4 / (e ** 0.4).sum(1, keepdims=True)  # under-confident

    for cal in (DiagDirichlet(), FixedDiagDirichlet(),
                DirichletCalibrator("full"),
                DirichletCalibrator("diagonal"),
                DirichletCalibrator("fixed_diagonal")):
        cal.fit(probs, y)
        out = cal.predict_proba(probs)
        assert np.allclose(out.sum(1), 1, atol=1e-8)
        assert nll_from_probs(out, y) <= nll_from_probs(probs, y) + 1e-9

    ms = MatrixScaling().fit(logits * 0.4, y)
    out = ms.predict_proba(logits * 0.4)
    assert np.allclose(out.sum(1), 1, atol=1e-8)


def test_device_utils():
    from mural_tpu.utils.device import (check_device_id,
                                        get_available_device,
                                        list_devices)
    devs = list_devices()
    assert len(devs) >= 1
    d = get_available_device(0.0)
    assert d is not None
    assert check_device_id(0) is devs[0]
    with pytest.raises(ValueError):
        check_device_id(len(devs))


def test_progress_table_renders_and_updates():
    """CLIReporter analogue (ref run_train_raytune.py:294)."""
    lines = []
    from mural_tpu.tune.runner import ProgressTable
    pt = ProgressTable(printer=lines.append, interval=0.05)
    pt.update("Train_a_00000", "RUNNING", 1,
              {"loss": 0.5, "fdiri_loss": 0.41, "after_min_loss": 0})
    pt.start()
    import time
    time.sleep(0.2)
    pt.update("Train_a_00001", "TERMINATED", 3, {"loss": 0.4})
    pt.stop()
    assert lines, "no table printed"
    final = lines[-1]
    assert "Train_a_00000" in final and "Train_a_00001" in final
    assert "RUNNING" in final and "TERMINATED" in final
    assert "0.41" in final


def test_transfer_use_ray_builds_search_space(tmp_path, monkeypatch):
    """transfer --use_ray must search over the learning params (choice
    on batch_size/optim/lr_scheduler/LR_gamma, loguniform on lr and
    weight_decay -- run_train_TL_raytune.py:276-303 semantics) while the
    architecture stays pinned from the checkpoint config; round-2 pinned
    everything, so N trials ran one identical configuration."""
    import pickle

    from mural_tpu.cli import main as cli_main
    from mural_tpu.cli.mural_snv import create_parser

    cfg = dict(local_radius=5, local_order=3, distal_radius=50,
               CNN_kernel_size=3, CNN_out_channels=8,
               local_hidden1_size=32, local_hidden2_size=16,
               emb_dropout=0.1, local_dropout=0.1,
               distal_fc_dropout=0.25, segment_center=300000,
               sampled_segments=10, n_class=4, model_no=2,
               emb_dims=[(65, 2)] * 11, n_cont=0)
    cfg_path = tmp_path / "model.config.pkl"
    with open(cfg_path, "wb") as fh:
        pickle.dump(cfg, fh)

    captured = {}

    def fake_run_experiment(space, opts, model_type, exp):
        captured.update(space=space, exp=exp)

    monkeypatch.setattr("mural_tpu.tune.runner.run_experiment",
                        fake_run_experiment)

    parser = create_parser("snv")
    args = parser.parse_args([
        "transfer",
        "--ref_genome", "g.fa", "--train_data", "t.bed",
        "--model_path", str(tmp_path / "model"),
        "--model_config_path", str(cfg_path),
        "--train_all", "--use_ray", "--n_trials", "4",
        "--batch_size", "64", "128",
        "--optim", "Adam", "AdamW",
        "--learning_rate", "1e-4", "1e-2",
        "--weight_decay", "1e-6", "1e-3",
        "--LR_gamma", "0.9", "0.95",
    ])
    cli_main.cmd_transfer(args, "snv")

    space = captured["space"]
    assert isinstance(space["batch_size"], Choice)
    assert isinstance(space["optim"], Choice)
    assert isinstance(space["lr_scheduler"], Choice)
    assert isinstance(space["LR_gamma"], Choice)
    assert isinstance(space["learning_rate"], LogUniform)
    assert isinstance(space["weight_decay"], LogUniform)
    # architecture pinned from the checkpoint, not searched
    assert space["distal_radius"] == 50
    assert space["CNN_out_channels"] == 8
    assert space["transfer_learning"] is True

    # sampling yields distinct learning configurations across trials
    rng = np.random.default_rng(0)
    lrs = {sample_config(space, rng)["learning_rate"] for _ in range(4)}
    assert len(lrs) >= 2


def test_transfer_without_ray_pins_first_elements(tmp_path, monkeypatch):
    """Standalone transfer keeps the reference's first-element scalars."""
    import pickle

    from mural_tpu.cli import main as cli_main
    from mural_tpu.cli.mural_snv import create_parser

    cfg = dict(local_radius=5, local_order=3, distal_radius=50,
               CNN_kernel_size=3, CNN_out_channels=8,
               local_hidden1_size=32, local_hidden2_size=16,
               emb_dropout=0.1, local_dropout=0.1,
               distal_fc_dropout=0.25, segment_center=300000,
               sampled_segments=10, n_class=4, model_no=2,
               emb_dims=[(65, 2)] * 11, n_cont=0)
    cfg_path = tmp_path / "model.config.pkl"
    with open(cfg_path, "wb") as fh:
        pickle.dump(cfg, fh)

    captured = {}
    monkeypatch.setattr(
        "mural_tpu.tune.runner.run_experiment",
        lambda space, opts, model_type, exp: captured.update(space=space))

    parser = create_parser("snv")
    args = parser.parse_args([
        "transfer",
        "--ref_genome", "g.fa", "--train_data", "t.bed",
        "--model_path", str(tmp_path / "model"),
        "--model_config_path", str(cfg_path),
        "--train_all",
        "--batch_size", "64", "128",
        "--learning_rate", "1e-4", "1e-2",
    ])
    cli_main.cmd_transfer(args, "snv")
    assert captured["space"]["batch_size"] == 64
    assert captured["space"]["learning_rate"] == pytest.approx(1e-4)
