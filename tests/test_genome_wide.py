"""Genome-wide prediction engine tests (CPU)."""
import gzip
import os

import numpy as np
import pandas as pd
import pytest


def test_iter_focal_sites(tiny_genome):
    from mural_tpu.genome.fasta import Genome
    from mural_tpu.predict.genome_wide import iter_focal_sites

    g = Genome.from_fasta(tiny_genome["path"])
    seq = tiny_genome["seqs"]["chrM"]
    chunks = list(iter_focal_sites(g, "A", chroms=["chrM"], chunk=200))
    pos = np.concatenate([c[1] for c in chunks])
    neg = np.concatenate([c[2] for c in chunks])
    expect_fwd = {i for i, ch in enumerate(seq) if ch == "A"}
    expect_rev = {i for i, ch in enumerate(seq) if ch == "T"}
    got_fwd = set(pos[~neg].tolist())
    got_rev = set(pos[neg].tolist())
    assert got_fwd == expect_fwd
    assert got_rev == expect_rev
    # sorted within chunks
    for c in chunks:
        assert (np.diff(c[1]) >= 0).all()


def test_run_genome_predict_end_to_end(trained_checkpoint, tiny_genome,
                                       tmp_path):
    from mural_tpu.predict.genome_wide import (GenomePredictOptions,
                                               run_genome_predict)
    cdir = trained_checkpoint
    out = str(tmp_path / "gp.tsv.gz")
    opts = GenomePredictOptions(
        ref_genome=tiny_genome["path"],
        model_path=os.path.join(cdir, "model"),
        model_config_path=os.path.join(cdir, "model.config.pkl"),
        calibrator_path=os.path.join(cdir, "model.fdiri_cal.pkl"),
        pred_file=out, focal_base="A", chroms=["chrM"],
        batch_size=64, flush_batches=2)
    n = run_genome_predict(opts, "snv", printer=lambda *a: None)
    seq = tiny_genome["seqs"]["chrM"]
    expect = sum(1 for ch in seq if ch in "AT")
    assert n == expect
    df = pd.read_csv(out, sep="\t")
    assert len(df) == expect
    assert list(df.columns) == ["chrom", "start", "end", "strand",
                                "mut_type",
                                "prob0", "prob1", "prob2", "prob3"]
    assert (df["mut_type"] == 0).all()
    probs = df[[f"prob{i}" for i in range(4)]].to_numpy()
    assert np.all(probs > -1) and np.isfinite(probs).all()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=5e-3)
    # every site's strand matches its base
    for _, r in df.head(50).iterrows():
        base = seq[r["start"]]
        assert base == ("A" if r["strand"] == "+" else "T")


@pytest.fixture(scope="module")
def trained_checkpoint(tiny_genome, tiny_bed, tmp_path_factory):
    from mural_tpu.train.loop import TrainOptions, train_trial
    trial_dir = str(tmp_path_factory.mktemp("gw_trial"))
    config = dict(
        local_radius=3, local_order=2, local_dropout=0.1,
        distal_fc_dropout=0.1, emb_dropout=0.1,
        local_hidden1_size=16, local_hidden2_size=8,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8, transfer_learning=False)
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"], n_class=4,
        model_no=2, epochs=1, valid_ratio=0.2, split_seed=3,
        trial_dir=trial_dir, rng_seed=0)
    train_trial(config, opts, "snv")
    return os.path.join(trial_dir, "checkpoint_0")
