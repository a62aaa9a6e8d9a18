"""Segmentation + dataset construction tests (reference-parity semantics)."""
import numpy as np
import pytest

from mural_tpu.data.batcher import segment_pool_batches
from mural_tpu.data.dataset import prepare_dataset
from mural_tpu.genome.bed import BedFile, segment_sites
from mural_tpu.genome import encode as enc


def _write_bed(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    return str(path)


def test_segment_grouping_semantics(tmp_path):
    """Parity with bed_reader (preprocessing.py:39-106): windows of
    central_bp, chrom reset to [1, 1+central_bp), '+' group emitted before
    '-', window slides past gaps."""
    rows = [
        ("chr1", 100, 101, ".", 0, "+"),
        ("chr1", 150, 151, ".", 1, "-"),
        ("chr1", 900, 901, ".", 2, "+"),    # 900 <= end0=100+1000 -> same seg
        ("chr1", 1500, 1501, ".", 3, "+"),  # > 1100 -> new window
        ("chr2", 50, 51, ".", 0, "-"),      # chrom reset: window [1, 1001)
        ("chr2", 2500, 2501, ".", 1, "+"),  # slides to [2001, 3001)
    ]
    bed = BedFile.read(_write_bed(tmp_path / "t.bed", rows))
    segs = segment_sites(bed, 1000)
    as_rows = [list(s) for s in segs]
    assert as_rows == [[0, 2], [1], [3], [4], [5]]


def test_dataset_build_and_local_columns(tiny_genome, tiny_bed):
    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=10_000,
                         local_radius=3, local_order=2, distal_radius=30,
                         model_type="snv")
    assert ds.n_sites > 100
    # order-1 local: mid column must be uniform per strand convention (A on
    # '+', and revcomp makes '-' sites read A too)
    mid = ds.local1[:, 3]
    assert (mid == 0).all()
    # k-mer ids in range
    assert ds.cat.min() >= 0 and ds.cat.max() <= 4 ** 2
    assert ds.cat.shape[1] == enc.window_size(3, 2, "snv")
    # segments tile the sites
    assert ds.seg_offsets[-1] == ds.n_sites
    # emb_dims formula parity (training.py:254)
    emb_dims = [(x, min(16, int(x ** 0.25))) for x in ds.cat_dims]
    assert all(d[0] <= 4 ** 2 + 1 for d in emb_dims)


def test_distal_gather_matches_reference_encoding(tiny_genome, tiny_bed):
    """distal one-hot (via table lookup of gathered codes) must equal the
    reference's seq_ohe_encoder semantics, including revcomp on '-'."""
    from mural_tpu.genome.fasta import Genome

    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=10_000,
                         local_radius=3, local_order=1, distal_radius=10,
                         model_type="snv")
    g = Genome.from_fasta(tiny_genome["path"])
    rows = np.arange(min(50, ds.n_sites))
    wins = ds.gather_distal(rows)
    oh = enc.ONE_HOT_TABLE[wins]          # (N, 21, 4)
    for i in rows:
        chrom = ds.chrom_names[ds.chrom_id[i]]
        s = int(ds.start[i])
        strand = "-" if ds.strand_neg[i] else "+"
        ref_codes = g.window(chrom, s - 10, s + 11, strand)
        assert np.allclose(oh[i], enc.ONE_HOT_TABLE[ref_codes])


def test_subset_segments_split(tiny_genome, tiny_bed):
    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=5_000,
                         local_radius=2, local_order=1, distal_radius=20)
    n = ds.n_segments
    rng = np.random.default_rng(0)
    valid_ids = rng.choice(n, size=max(1, n // 4), replace=False)
    train_ids = np.setdiff1d(np.arange(n), valid_ids)
    tr = ds.subset_segments(train_ids)
    va = ds.subset_segments(valid_ids)
    assert tr.n_sites + va.n_sites == ds.n_sites
    assert tr.n_segments == len(train_ids)
    # subset keeps per-site alignment
    r0 = va.segment_rows(0)
    assert np.array_equal(va.y[r0], va.y[:len(r0)])


def test_batcher_static_shapes_and_order(tiny_genome, tiny_bed):
    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=5_000,
                         local_radius=2, local_order=1, distal_radius=20)
    B = 32
    # unshuffled + padded: row order must equal emission order, coverage total
    rows = []
    for b in segment_pool_batches(ds, 3, B, shuffle=False, pad_final=True):
        assert len(b.y) == B
        rows.extend(b.rows[:b.n_valid])
    assert np.array_equal(np.asarray(rows), np.arange(ds.n_sites))
    # shuffled training: full batches only
    total = 0
    for b in segment_pool_batches(ds, 3, B, shuffle=True,
                                  rng=np.random.default_rng(0)):
        assert b.n_valid == B
        total += B
    assert total == (ds.n_sites // B) * B


def test_indel_window_convention(tiny_genome, tmp_path):
    rows = [("chr1", 100, 101, ".", 0, "+"), ("chr1", 200, 201, ".", 3, "-")]
    bed = _write_bed(tmp_path / "i.bed", rows)
    ds = prepare_dataset(bed, tiny_genome["path"], central_bp=10_000,
                         local_radius=3, local_order=1, distal_radius=10,
                         model_type="indel")
    assert ds.distal_width == 20
    assert ds.local1.shape[1] == 6   # 2r columns, no mid
    wins = ds.gather_distal(np.array([0]))
    from mural_tpu.genome.fasta import Genome
    g = Genome.from_fasta(tiny_genome["path"])
    ref = g.window("chr1", 100 - 10 + 1, 101 + 10, "+")
    assert np.array_equal(wins[0], ref)
