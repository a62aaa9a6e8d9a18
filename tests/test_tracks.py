"""Coverage-track reader tests (the bigWig replacement)."""
import gzip

import numpy as np
import pytest

from mural_tpu.genome.tracks import TrackSet, read_track_list


@pytest.fixture()
def bedgraph(tmp_path):
    p = tmp_path / "cov.bedGraph"
    with open(p, "w") as fh:
        fh.write("# comment\n")
        fh.write("chr1\t0\t100\t2.0\n")
        fh.write("chr1\t100\t200\t4.0\n")
        fh.write("chr2\t0\t50\t1.0\n")
    return str(p)


def test_read_track_list(tmp_path, bedgraph):
    lst = tmp_path / "tracks.txt"
    with open(lst, "w") as fh:
        fh.write("# header\n")
        fh.write(f"{bedgraph}\tcoverage\t5\n")
        fh.write(f"{bedgraph}\tcov2\n")
    files, names, radii = read_track_list(str(lst), default_radius=7)
    assert names == ["coverage", "cov2"]
    assert radii == [5, 7]


def test_trackset_means(bedgraph):
    ts = TrackSet([bedgraph], ["cov"], [2])
    # SNV window around start=10: [8, 13) -> all value 2
    out = ts.mean_over_sites(["chr1"], np.array([10]), np.array([11]),
                             "snv")
    assert out[0, 0] == pytest.approx(2.0)
    # window straddling the 100 boundary: positions 98,99 (2.0) and
    # 100,101,102 (4.0) -> mean 3.2
    out = ts.mean_over_sites(["chr1"], np.array([100]), np.array([101]),
                             "snv")
    assert out[0, 0] == pytest.approx((2 * 2 + 3 * 4) / 5)
    # clipping at chromosome edges and unknown chromosomes
    out = ts.mean_over_sites(["chr2", "chrX"], np.array([0, 5]),
                             np.array([1, 6]), "snv")
    assert out[0, 0] == pytest.approx(1.0)
    assert out[1, 0] == 0.0


def test_npz_track(tmp_path):
    vals = np.arange(100, dtype=np.float64)
    np.savez(tmp_path / "t.npz", chr1=vals)
    ts = TrackSet([str(tmp_path / "t.npz")], ["t"], [1])
    out = ts.mean_over_sites(["chr1"], np.array([50]), np.array([51]),
                             "snv")
    # window [49, 52): mean of 49,50,51
    assert out[0, 0] == pytest.approx(50.0)


def test_gz_bedgraph(tmp_path):
    p = tmp_path / "c.bedGraph.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("chr1\t0\t10\t3.5\n")
    ts = TrackSet([str(p)], ["c"], [1])
    out = ts.mean_over_sites(["chr1"], np.array([5]), np.array([6]), "snv")
    assert out[0, 0] == pytest.approx(3.5)


def test_cont_features_flow_into_model(tiny_genome, tiny_bed, tmp_path):
    """bw_paths -> cont features -> SNVNet2 concat branch end-to-end."""
    from mural_tpu.train.loop import TrainOptions, train_trial

    # constant-ish track over chr1/chrM
    with open(tmp_path / "cov.bedGraph", "w") as fh:
        fh.write("chr1\t0\t200000\t1.5\nchrM\t0\t600\t0.5\n")
    with open(tmp_path / "tracks.txt", "w") as fh:
        fh.write(f"{tmp_path / 'cov.bedGraph'}\tcov\t5\n")

    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        bw_paths=str(tmp_path / "tracks.txt"), n_class=4, model_no=2,
        epochs=1, valid_ratio=0.25, split_seed=9,
        trial_dir=str(tmp_path / "trial"))
    metrics = train_trial(config, opts, "snv")
    assert np.isfinite(metrics["loss"])

    # Network3 with the separate cont head
    opts3 = TrainOptions(
        train_data=tiny_bed, ref_genome=tiny_genome["path"],
        bw_paths=str(tmp_path / "tracks.txt"), n_class=4, model_no=3,
        epochs=1, valid_ratio=0.25, split_seed=9,
        trial_dir=str(tmp_path / "trial3"))
    metrics3 = train_trial(dict(config), opts3, "snv")
    assert np.isfinite(metrics3["loss"])
