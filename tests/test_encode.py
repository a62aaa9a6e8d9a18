"""Golden-vector and property tests for the genome/encoding layer.

Golden values mirror the reference tables at
MuRaL/data/preprocessing.py:261-291 (one-hot), :655-679 (digits) and the
k-mer radix packing at :702-722 -- re-derived here independently.
"""
import numpy as np
import pytest

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import (COMPLEMENT, N_CODE, Genome,
                                    decode_sequence, encode_sequence)


def test_encode_decode_roundtrip():
    s = "ACGTRYMSWKBDHVN"
    codes = encode_sequence(s)
    assert list(codes) == list(range(15))
    assert decode_sequence(codes) == s
    # lowercase and unknowns
    assert list(encode_sequence("acgtn")) == [0, 1, 2, 3, 14]
    assert list(encode_sequence("xz?-")) == [14] * 4
    assert list(encode_sequence("Uu")) == [3, 3]


def test_complement_table():
    pairs = {"A": "T", "C": "G", "G": "C", "T": "A", "R": "Y", "Y": "R",
             "M": "K", "K": "M", "S": "S", "W": "W", "B": "V", "V": "B",
             "D": "H", "H": "D", "N": "N"}
    for a, b in pairs.items():
        ca = encode_sequence(a)[0]
        cb = encode_sequence(b)[0]
        assert COMPLEMENT[ca] == cb


def test_one_hot_golden():
    # reference golden rows (preprocessing.py:758-772)
    t = enc.ONE_HOT_TABLE
    assert np.allclose(t[encode_sequence("A")[0]], [1, 0, 0, 0])
    assert np.allclose(t[encode_sequence("R")[0]], [0.5, 0, 0.5, 0])
    assert np.allclose(t[encode_sequence("B")[0]], [0, 1/3, 1/3, 1/3])
    assert np.allclose(t[encode_sequence("N")[0]], [0.25] * 4)
    assert np.allclose(t.sum(axis=1), 1.0)


def test_reverse_complement_one_hot_equivalence():
    """one_hot(revcomp(x)) must equal the reference's rc table applied to
    reversed x -- i.e. flipping both axes of the '+' one-hot."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 15, size=50).astype(np.uint8)
    fwd = enc.ONE_HOT_TABLE[codes]                  # (L, 4)
    rc = enc.ONE_HOT_TABLE[COMPLEMENT[codes][::-1]]
    assert np.allclose(rc, fwd[::-1, ::-1])


def test_gather_windows_edges():
    codes = encode_sequence("ACGTACGTAC")
    w = enc.gather_windows(codes, np.array([-2, 0, 7]), 5,
                           np.zeros(3, bool))
    assert decode_sequence(w[0]) == "NNACG"
    assert decode_sequence(w[1]) == "ACGTA"
    assert decode_sequence(w[2]) == "TACNN"


def test_gather_windows_negative_strand_equals_ref_scheme():
    """Reference '-' path: encode revcomp of the merged interval, slice
    windows from the end (preprocessing.py:697-720).  Our per-site gather
    + revcomp must agree."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 15, size=300).astype(np.uint8)
    radius = 5
    width = 2 * radius + 1
    sites = np.array([40, 44, 120])
    # reference scheme over a merged interval covering all sites
    start0 = sites.min() - radius
    stop0 = sites.max() + radius + 1
    merged = codes[start0:stop0]
    rc = COMPLEMENT[merged][::-1]
    L = len(rc)
    ours = enc.gather_windows(codes, sites - radius, width,
                              np.ones(len(sites), bool))
    for i, s in enumerate(sites):
        off = (s - radius) - start0
        ref_win = rc[L - off - width: L - off] if off else rc[L - off - width:]
        assert np.array_equal(ours[i], ref_win)


def test_kmer_ids_golden():
    codes = encode_sequence("ACGTN")
    ids = enc.kmer_ids(codes[None, :], 3)[0]
    # ACG = 0*16+1*4+2 = 6 ; CGT = 1*16+2*4+3 = 27 ; GTN -> pad 64
    assert list(ids) == [6, 27, 64]
    ids1 = enc.kmer_ids(codes[None, :], 1)[0]
    assert list(ids1) == [0, 1, 2, 3, -1]


def test_order1_outlier_clamp():
    codes = encode_sequence("ANGT")
    out = enc.order1_local(codes[None, :])
    assert list(out[0]) == [0, 0, 2, 3]


def test_check_mid_base():
    w = np.stack([encode_sequence("CAG"), encode_sequence("TAG")])
    enc.check_snv_mid_base(w, 1)  # both mid A -> fine
    w2 = np.stack([encode_sequence("CAG"), encode_sequence("TGG")])
    with pytest.raises(ValueError):
        enc.check_snv_mid_base(w2, 1)


def test_local_headers():
    assert enc.local_headers(3, 1, "snv") == \
        ["us3", "us2", "us1", "mid", "ds1", "ds2", "ds3"]
    assert enc.local_headers(2, 1, "indel") == ["us2", "us1", "ds1", "ds2"]
    assert enc.local_headers(7, 3, "snv") == [f"cat{i+1}" for i in range(13)]
    assert enc.window_size(7, 3, "snv") == 13
    assert enc.window_size(4000, 1, "indel") == 8000


def test_expanded_start_conventions():
    # SNV: [start-r, start+r+1); INDEL: [start-r+1, stop+r)
    assert enc.expanded_start(np.array([100]), 10, "snv")[0] == 90
    assert enc.expanded_start(np.array([100]), 10, "indel")[0] == 91


def test_genome_window(tiny_genome):
    g = Genome.from_fasta(tiny_genome["path"])
    seq = tiny_genome["seqs"]["chr1"]
    w = g.window("chr1", 100, 110)
    assert decode_sequence(w) == seq[100:110]
    w = g.window("chrM", -3, 4)
    assert decode_sequence(w) == "NNN" + tiny_genome["seqs"]["chrM"][:4]
