"""Per-base distal track channels: train -> checkpoint -> predict.

The reference *promises* in_channels = 4**distal_order + n_cont when
bigWig files are given (MuRaL/training.py:258-260) but its NP pipeline
only ever emits 4 channels (preprocessing.py:978-999), so the path
crashes there.  Here it must work end-to-end (VERDICT round-1 item 5).
"""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def track_files(tiny_genome, tmp_path_factory):
    """Two synthetic bedGraph tracks covering chr1/chrM."""
    rng = np.random.default_rng(7)
    base = tmp_path_factory.mktemp("tracks")
    paths = []
    for t in range(2):
        p = base / f"t{t}.bedGraph"
        with open(p, "w") as fh:
            for chrom, n in (("chr1", 200_000), ("chrM", 600)):
                step = 1000 if chrom == "chr1" else 100
                for s in range(0, n, step):
                    v = float(rng.random()) * (t + 1)
                    fh.write(f"{chrom}\t{s}\t{min(s + step, n)}\t{v:.4f}\n")
        paths.append(str(p))
    lst = base / "bw_paths.txt"
    lst.write_text("\n".join(f"{p} trk{i} 5"
                             for i, p in enumerate(paths)) + "\n")
    return {"list": str(lst), "paths": paths}


def _config(**over):
    c = dict(
        local_radius=3, local_order=2, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=12, local_hidden2_size=6,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=8, transfer_learning=False)
    c.update(over)
    return c


def test_dataset_distal_track_alignment(tiny_genome, tiny_bed,
                                        track_files):
    from mural_tpu.data.batcher import segment_pool_batches
    from mural_tpu.data.dataset import prepare_dataset
    from mural_tpu.genome.tracks import TrackSet, read_track_list

    files, names, radii = read_track_list(track_files["list"], 3)
    tracks = TrackSet(files, names, radii)
    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=5000,
                         local_radius=3, local_order=2,
                         distal_radius=105, tracks=tracks,
                         bw_distal=True)
    assert ds.n_cont == 2 and ds.n_distal_tracks == 2
    b = next(iter(segment_pool_batches(ds, 2, 16, shuffle=False)))
    assert b.distal_tracks is not None
    assert b.distal_tracks.shape == (16, ds.distal_width, 2)
    # centre column of each window = the track value AT the site, for
    # both strands (reverse rows are flipped around the same centre)
    r = ds.distal_radius
    centre = b.distal_tracks[:, r, :]
    rows = b.rows[:b.n_valid]
    for i, row in enumerate(rows):
        chrom = ds.chrom_names[ds.chrom_id[row]]
        pos = int(ds.start[row])
        for t in range(2):
            expect = tracks.tracks[t].mean(chrom, pos, pos + 1)
            assert centre[i, t] == pytest.approx(expect, abs=1e-3)


@pytest.mark.slow
def test_train_predict_with_distal_tracks(tiny_genome, tiny_bed,
                                          track_files, tmp_path):
    import pandas as pd

    from mural_tpu.predict.pipeline import PredictOptions, run_predict
    from mural_tpu.train.checkpoint import load_config
    from mural_tpu.train.loop import TrainOptions, train_trial

    trial_dir = str(tmp_path / "trial")
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        bw_paths=track_files["list"], n_class=4, model_no=2, epochs=1,
        valid_ratio=0.25, split_seed=3, trial_dir=trial_dir, rng_seed=0)
    metrics = train_trial(_config(), opts, "snv")
    assert np.isfinite(metrics["loss"])

    cdir = os.path.join(trial_dir, "checkpoint_0")
    config = load_config(os.path.join(cdir, "model.config.pkl"))
    assert config["n_cont"] == 2
    assert not config["without_bw_distal"]

    out = str(tmp_path / "pred.tsv")
    popts = PredictOptions(
        test_data=tiny_bed, ref_genome=tiny_genome["path"],
        model_path=os.path.join(cdir, "model"),
        model_config_path=os.path.join(cdir, "model.config.pkl"),
        pred_file=out, pred_batch_size=64,
        bw_paths=track_files["list"])
    run_predict(popts, "snv", printer=lambda *a: None)
    df = pd.read_csv(out, sep="\t")
    probs = df[[f"prob{i}" for i in range(4)]].to_numpy()
    assert len(df) > 0 and np.isfinite(probs).all()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=5e-3)

    # predicting without the tracks must fail with the clear message
    with pytest.raises(ValueError, match="n_cont=2"):
        run_predict(PredictOptions(
            test_data=tiny_bed, ref_genome=tiny_genome["path"],
            model_path=os.path.join(cdir, "model"),
            model_config_path=os.path.join(cdir, "model.config.pkl"),
            pred_file=out, pred_batch_size=64),
            "snv", printer=lambda *a: None)


def test_without_bw_distal_keeps_4_channels(tiny_genome, tiny_bed,
                                            track_files, tmp_path):
    """--without_bw_distal: tracks feed the local mean features only;
    distal stays 4-channel (reference default behaviour pre-1.2)."""
    from mural_tpu.train.checkpoint import load_config
    from mural_tpu.train.loop import TrainOptions, train_trial

    trial_dir = str(tmp_path / "trial_nd")
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        bw_paths=track_files["list"], without_bw_distal=True, n_class=4,
        model_no=2, epochs=1, valid_ratio=0.25, split_seed=3,
        trial_dir=trial_dir, rng_seed=0)
    metrics = train_trial(_config(), opts, "snv")
    assert np.isfinite(metrics["loss"])
    config = load_config(os.path.join(trial_dir, "checkpoint_0",
                                      "model.config.pkl"))
    assert config["n_cont"] == 2 and config["without_bw_distal"]
