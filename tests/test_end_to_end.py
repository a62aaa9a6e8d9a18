"""End-to-end slice: train a tiny SNVNet2, checkpoint, predict, verify the
reference's file layout and TSV schema (SURVEY.md section 7.2)."""
import os
import pickle

import numpy as np
import pandas as pd
import pytest


def _snv_config(batch_size=32):
    return dict(
        local_radius=3, local_order=2, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=24, local_hidden2_size=12,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=batch_size, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8,
        transfer_learning=False,
    )


@pytest.fixture(scope="module")
def trained_trial(tiny_genome, tiny_bed, tmp_path_factory):
    from mural_tpu.train.loop import TrainOptions, train_trial
    trial_dir = str(tmp_path_factory.mktemp("trial"))
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        n_class=4, model_no=2, epochs=2, valid_ratio=0.2, split_seed=42,
        grace_period=5, trial_dir=trial_dir, rng_seed=0)
    reports = []
    metrics = train_trial(_snv_config(), opts, "snv",
                          report_fn=lambda m: reports.append(m) or True)
    return trial_dir, metrics, reports


def test_train_trial_outputs(trained_trial):
    trial_dir, metrics, reports = trained_trial
    assert len(reports) == 2
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["fdiri_loss"])
    # checkpoint triple exists (training.py:570-578 layout)
    for epoch in (0, 1):
        cdir = os.path.join(trial_dir, f"checkpoint_{epoch}")
        assert os.path.exists(os.path.join(cdir, "model"))
        assert os.path.exists(os.path.join(cdir, "model.config.pkl"))
        assert os.path.exists(os.path.join(cdir, "model.fdiri_cal.pkl"))
        assert os.path.exists(os.path.join(cdir,
                                           f"epoch_{epoch}_metrics.txt"))
    # progress.csv written
    assert os.path.exists(os.path.join(trial_dir, "progress.csv"))
    # config pickle is self-describing
    with open(os.path.join(trial_dir, "checkpoint_0",
                           "model.config.pkl"), "rb") as fh:
        config = pickle.load(fh)
    assert config["n_class"] == 4
    assert config["model_no"] == 2
    assert "emb_dims" in config


def test_predict_roundtrip(trained_trial, tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.predict import PredictOptions, run_predict
    trial_dir, _, _ = trained_trial
    cdir = os.path.join(trial_dir, "checkpoint_1")
    pred_file = str(tmp_path / "pred.tsv.gz")
    opts = PredictOptions(
        test_data=tiny_bed, ref_genome=tiny_genome["path"],
        model_path=os.path.join(cdir, "model"),
        model_config_path=os.path.join(cdir, "model.config.pkl"),
        calibrator_path=os.path.join(cdir, "model.fdiri_cal.pkl"),
        pred_file=pred_file, pred_batch_size=64,
        kmer_corr=[3, 99], region_corr=[10000])
    msgs = []
    df = run_predict(opts, "snv",
                     printer=lambda *a: msgs.append(" ".join(map(str, a))))
    # a k wider than the checkpoint's local window warns and skips
    # instead of raising KeyError after the full inference
    assert any("skipping 99-mer" in m for m in msgs)
    assert any("3mer correlation" in m for m in msgs)
    # schema parity (run_predict.py:236)
    assert list(df.columns) == ["chrom", "start", "end", "strand",
                                "mut_type", "prob0", "prob1", "prob2",
                                "prob3"]
    probs = df[["prob0", "prob1", "prob2", "prob3"]].to_numpy()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-6)
    # row count == BED sites; sorted by chrom,start
    from mural_tpu.genome.bed import BedFile
    assert len(df) == len(BedFile.read(tiny_bed))
    assert (df.groupby("chrom")["start"].apply(
        lambda s: (np.diff(s) >= 0).all())).all()
    # file written and re-readable
    back = pd.read_csv(pred_file, sep="\t")
    assert len(back) == len(df)


def test_predict_without_calibrator(trained_trial, tiny_genome, tiny_bed):
    from mural_tpu.predict import PredictOptions, run_predict
    trial_dir, _, _ = trained_trial
    cdir = os.path.join(trial_dir, "checkpoint_0")
    opts = PredictOptions(
        test_data=tiny_bed, ref_genome=tiny_genome["path"],
        model_path=os.path.join(cdir, "model"),
        model_config_path=os.path.join(cdir, "model.config.pkl"),
        pred_file="", poisson_calib=True)
    df = run_predict(opts, "snv", printer=lambda *a: None)
    # poisson calibration: prob0 = 1 + log(p0) <= p0' semantics
    assert (df["prob0"] <= 1).all()


def test_transfer_learning_resumes(trained_trial, tiny_genome, tiny_bed,
                                   tmp_path):
    from mural_tpu.train.loop import TrainOptions, train_trial
    from mural_tpu.train.checkpoint import load_config
    trial_dir, _, _ = trained_trial
    cdir = os.path.join(trial_dir, "checkpoint_1")
    config = load_config(os.path.join(cdir, "model.config.pkl"))
    config["transfer_learning"] = True
    config["train_all"] = True
    config["init_fc_with_pretrained"] = True
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        n_class=4, model_no=config["model_no"], epochs=1, valid_ratio=0.2,
        split_seed=1, trial_dir=str(tmp_path),
        model_path=os.path.join(cdir, "model"), rng_seed=3)
    metrics = train_trial(config, opts, "snv")
    assert np.isfinite(metrics["loss"])


def test_indel_train_small(tiny_genome, tmp_path, rng):
    """INDEL path: UNet over 2r windows, 8 classes, poisson-calibrated."""
    from tests.conftest import make_bed
    from mural_tpu.train.loop import TrainOptions, train_trial
    bed = tmp_path / "indel.bed"
    # indel BED has no mid-base constraint
    rows = []
    seq = tiny_genome["seqs"]["chr1"]
    pos = sorted(rng.choice(len(seq) - 100, size=300, replace=False))
    for i, p in enumerate(pos):
        rows.append(("chr1", int(p), int(p) + 1, ".",
                     int(rng.integers(0, 8)), "+" if i % 2 else "-"))
    rows.sort(key=lambda r: r[1])
    with open(bed, "w") as fh:
        for r in rows:
            fh.write("\t".join(map(str, r)) + "\n")

    config = dict(
        local_radius=3, local_order=1, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=100, segment_center=20000, sampled_segments=4,
        batch_size=16, optim="AdamW", learning_rate=1e-3,
        lr_scheduler="StepLR2", LR_gamma=0.98, weight_decay=0.01,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=7, CNN_out_channels=4,
        down_list=[1, 2, 2, 5, 5, 1], use_reverse=True,
        transfer_learning=False,
    )
    opts = TrainOptions(
        train_data=str(bed), ref_genome=tiny_genome["path"], n_class=8,
        model_no=0, epochs=1, valid_ratio=0.25, split_seed=5,
        trial_dir=str(tmp_path / "trial"), rng_seed=0)
    metrics = train_trial(config, opts, "indel")
    assert np.isfinite(metrics["loss"])


def test_train_rejects_missing_validation_classes(tiny_genome, tiny_bed,
                                                 tmp_path):
    """n_class larger than the classes the data shows fails fast with a
    clear message (the reference's dirichletcal crashes much later with
    an obscure Newton shape error)."""
    from mural_tpu.train.loop import TrainOptions, train_trial
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        n_class=8, model_no=2, epochs=1, valid_ratio=0.2, split_seed=42,
        grace_period=5, trial_dir=str(tmp_path), rng_seed=0)
    with pytest.raises(ValueError, match="never shows mutation class"):
        train_trial(_snv_config(), opts, "snv")
