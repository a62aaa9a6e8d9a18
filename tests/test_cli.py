"""CLI surface tests: parser parity + end-to-end sub-command smoke runs."""
import os

import numpy as np
import pandas as pd
import pytest

from mural_tpu.cli.main import create_parser


def test_subcommands_present():
    for mt in ("snv", "indel"):
        parser = create_parser(mt)
        subs = next(a for a in parser._actions
                    if a.dest == "command").choices
        assert set(subs) == {"train", "transfer", "predict",
                             "predict_genome", "evaluate", "scale",
                             "calc_scaling_factor", "get_best_model",
                             "convert"}


def test_train_parser_defaults_snv():
    parser = create_parser("snv")
    args = parser.parse_args(["train", "--ref_genome", "g.fa",
                              "--train_data", "t.bed"])
    assert args.model_no == 2
    assert args.n_class == 4
    assert args.distal_radius == [200]
    assert args.local_radius == [7]
    assert args.local_order == [3]
    assert args.local_hidden1_size == [150]
    assert args.learning_rate == [0.001]
    assert args.segment_center == 300000
    assert args.batch_size == [128]
    assert args.epochs == 10 and args.grace_period == 5
    assert args.weight_decay_auto == 0.1


def test_train_parser_defaults_indel():
    parser = create_parser("indel")
    args = parser.parse_args(["train", "--ref_genome", "g.fa",
                              "--train_data", "t.bed"])
    assert args.model_no == 0
    assert args.n_class == 8
    assert args.distal_radius == [4000]
    assert args.down_list == [1, 4, 5, 5, 5, 2]
    assert args.CNN_kernel_size == [7]
    assert args.CNN_out_channels == [8]
    assert not args.use_reverse


def test_cli_train_and_predict_end_to_end(tiny_genome, tiny_bed, tmp_path,
                                          monkeypatch):
    from mural_tpu.cli.mural_snv import main
    monkeypatch.chdir(tmp_path)
    rc = main([
        "train", "--ref_genome", tiny_genome["path"],
        "--train_data", tiny_bed,
        "--experiment_name", "cli_test", "--n_trials", "1",
        "--epochs", "1", "--segment_center", "5000",
        "--distal_radius", "105", "--local_radius", "3",
        "--local_order", "2", "--local_hidden1_size", "16",
        "--CNN_out_channels", "4", "--batch_size", "32",
        "--sampled_segments", "4", "--split_seed", "7",
        "--weight_decay_auto", "0",
    ])
    assert rc == 0
    exp_dir = tmp_path / "results" / "cli_test"
    trials = [d for d in os.listdir(exp_dir) if d.startswith("Train_")]
    assert len(trials) == 1
    cdir = exp_dir / trials[0] / "checkpoint_0"
    assert (cdir / "model").exists()
    assert (cdir / "model.config.pkl").exists()
    assert (cdir / "model.fdiri_cal.pkl").exists()

    # get_best_model
    rc = main(["get_best_model", "--trial_path", str(exp_dir)])
    assert rc == 0

    # predict
    pred = tmp_path / "pred.tsv.gz"
    rc = main([
        "predict", "--ref_genome", tiny_genome["path"],
        "--test_data", tiny_bed,
        "--model_path", str(cdir / "model"),
        "--model_config_path", str(cdir / "model.config.pkl"),
        "--calibrator_path", str(cdir / "model.fdiri_cal.pkl"),
        "--pred_file", str(pred), "--pred_batch_size", "64",
    ])
    assert rc == 0
    df = pd.read_csv(pred, sep="\t")
    assert list(df.columns) == ["chrom", "start", "end", "strand",
                                "mut_type", "prob0", "prob1", "prob2",
                                "prob3"]

    # evaluate (kmer + regional by default)
    rc = main([
        "evaluate", "--pred_file", str(pred), "--out_prefix",
        str(tmp_path / "ev"), "--ref_genome", tiny_genome["path"],
        "--kmer_length", "3", "--window_size", "10000",
    ])
    assert rc == 0
    assert (tmp_path / "ev.3-mer.mut_rates.tsv").exists()
    assert (tmp_path / "ev.3-mer.corr.txt").exists()
    assert (tmp_path / "ev.10Kb.mut_rates.tsv").exists()

    # scale + calc_scaling_factor
    rc = main([
        "calc_scaling_factor", "--pred_files", str(pred),
        "--genomewide_mu", "1.2e-8", "--m_proportions", "1.0",
        "--g_proportions", "1.0",
    ])
    assert rc == 0
    out_scaled = tmp_path / "scaled.tsv.gz"
    rc = main([
        "scale", "--pred_file", str(pred), "--scale_factor", "0.5",
        "--out_file", str(out_scaled),
    ])
    assert rc == 0
    sdf = pd.read_csv(out_scaled, sep="\t")
    ratio = sdf["prob1"].to_numpy() / df["prob1"].to_numpy()
    ok = np.isfinite(ratio)
    assert np.allclose(ratio[ok], 0.5, rtol=2e-2)

    # transfer from the CLI
    rc = main([
        "transfer", "--ref_genome", tiny_genome["path"],
        "--train_data", tiny_bed,
        "--model_path", str(cdir / "model"),
        "--model_config_path", str(cdir / "model.config.pkl"),
        "--train_all", "--init_fc_with_pretrained",
        "--experiment_name", "cli_tl", "--n_trials", "1",
        "--epochs", "1", "--split_seed", "7", "--batch_size", "32",
        "--weight_decay_auto", "0",
    ])
    assert rc == 0


def test_evaluate_motif_indel(tmp_path, tiny_genome, rng):
    """INDEL motif evaluation path incl. the reference's crash fix."""
    from mural_tpu.cli.mural_indel import main
    n = 400
    seq_len = len(tiny_genome["seqs"]["chr1"])
    starts = np.sort(rng.choice(seq_len - 100, size=n, replace=False))
    df = pd.DataFrame({
        "chrom": "chr1", "start": starts, "end": starts + 1,
        "strand": "+", "mut_type": rng.integers(0, 8, n),
    })
    probs = rng.dirichlet(np.ones(8), size=n)
    for i in range(8):
        df[f"prob{i}"] = probs[:, i]
    pred = tmp_path / "ipred.tsv"
    df.to_csv(pred, sep="\t", index=False)
    rc = main([
        "evaluate", "--pred_file", str(pred), "--out_prefix",
        str(tmp_path / "mo"), "--ref_genome", tiny_genome["path"],
        "--motif_only", "--motif_length", "5", "--n_class", "8",
    ])
    assert rc == 0
    assert (tmp_path / "mo.5-motif.mut_rates.tsv").exists()
    assert (tmp_path / "mo.5-motif.corr.txt").exists()
