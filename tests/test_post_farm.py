"""Postprocess farm + native TSV formatter tests (CPU)."""
import gzip
import os

import numpy as np
import pandas as pd
import pytest


def _chunk(rng, n=500, chrom="chr1"):
    pos = np.sort(rng.integers(0, 1_000_000, n))
    neg = rng.random(n) < 0.5
    logits = rng.normal(size=(n, 4)).astype(np.float32)
    return chrom, pos, neg, logits


def test_format_pred_tsv_native_matches_fallback(rng):
    from mural_tpu import native
    pos = np.sort(rng.integers(0, 10**9, 300))
    neg = rng.random(300) < 0.5
    probs = rng.dirichlet([1.0] * 4, size=300)
    # include extreme magnitudes that force %g exponent notation
    probs[0] = [1e-12, 1 - 3e-12, 1e-12, 1e-12]
    got = native.format_pred_tsv("chrX", pos, neg, probs)
    lines = got.decode().splitlines()
    assert len(lines) == 300
    first = lines[0].split("\t")
    assert first[0] == "chrX"
    assert int(first[2]) == int(first[1]) + 1
    assert first[3] in "+-"
    assert first[4] == "0"        # constant mut_type (schema parity)
    # numeric %.4g parity with python's %-formatting
    for j in range(4):
        assert first[5 + j] == "%.4g" % probs[0, j]
    # pure-numpy fallback produces identical bytes
    from mural_tpu.genome import encode  # noqa: F401 (import side effects)
    import mural_tpu.native as nat
    if nat.available():
        n_, k_ = probs.shape
        cols = [np.full(n_, "chrX"), pos.astype(str),
                (pos + 1).astype(str), np.where(neg, "-", "+"),
                np.full(n_, "0")]
        cols += [np.char.mod("%.4g", probs[:, j]) for j in range(k_)]
        rows = cols[0]
        for c in cols[1:]:
            rows = np.char.add(np.char.add(rows, "\t"), c)
        assert got == ("\n".join(rows) + "\n").encode()


@pytest.mark.parametrize("gz", [True, False])
def test_farm_inline_roundtrip(tmp_path, rng, gz):
    from mural_tpu.predict.post_farm import PostprocessFarm
    out = str(tmp_path / ("o.tsv.gz" if gz else "o.tsv"))
    farm = PostprocessFarm(out, ["chrom", "start", "end", "strand",
                                 "mut_type",
                                 "prob0", "prob1", "prob2", "prob3"])
    chunks = [_chunk(rng), _chunk(rng, chrom="chr2"), _chunk(rng, n=17)]
    for c in chunks:
        farm.submit(*c)
    total = farm.close()
    assert total == sum(len(c[1]) for c in chunks)
    df = pd.read_csv(out, sep="\t")
    assert len(df) == total
    assert list(df.chrom.unique()) == ["chr1", "chr2"]
    probs = df[[f"prob{i}" for i in range(4)]].to_numpy()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=5e-3)


@pytest.mark.slow
def test_farm_workers_byte_identical(tmp_path, rng):
    """n_workers>0 output must be byte-identical to the inline path
    (ordering restored by sequence number; each chunk its own gzip
    member, so only decompressed bytes are compared)."""
    from mural_tpu.predict.post_farm import PostprocessFarm
    chunks = [_chunk(rng, n=64 + i, chrom=f"chr{1 + i % 3}")
              for i in range(12)]
    cols = ["chrom", "start", "end", "strand", "mut_type",
            "prob0", "prob1", "prob2", "prob3"]

    inline = str(tmp_path / "inline.tsv.gz")
    farm = PostprocessFarm(inline, cols)
    for c in chunks:
        farm.submit(*c)
    n_inline = farm.close()

    fanned = str(tmp_path / "fanned.tsv.gz")
    farm = PostprocessFarm(fanned, cols, n_workers=2)
    for c in chunks:
        farm.submit(*c)
    n_fan = farm.close()

    assert n_fan == n_inline
    with gzip.open(inline, "rb") as fh:
        a = fh.read()
    with gzip.open(fanned, "rb") as fh:
        b = fh.read()
    assert a == b


def test_auto_n_workers_policy():
    """--n_workers default auto-sizes from the host core count: inline
    on <=2 cores (workers measured SLOWER there -- 79k vs 206k sites/s,
    round-4 STATUS), else cores-2 capped at 6 (the single ordered
    writer thread bounds returns beyond that)."""
    from mural_tpu.predict.post_farm import auto_n_workers
    assert auto_n_workers(1) == 0
    assert auto_n_workers(2) == 0
    assert auto_n_workers(3) == 1
    assert auto_n_workers(4) == 2
    assert auto_n_workers(8) == 6
    assert auto_n_workers(96) == 6
    # no-arg form resolves the real host affinity and follows the
    # same policy
    import os
    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:
        cores = os.cpu_count() or 1
    assert auto_n_workers() == auto_n_workers(cores)


@pytest.mark.slow
def test_farm_workers_scale_or_do_no_harm(tmp_path, rng):
    """On hosts with spare cores the fanned farm must not lose to
    inline on a postprocess-heavy load (the auto default's whole
    premise); on <=2-core hosts auto resolves to inline so the farm is
    never engaged (asserted via the policy test above).  Throughput
    comparison only runs where auto would actually engage workers."""
    from mural_tpu.predict.post_farm import PostprocessFarm, auto_n_workers
    import time as _time

    n_auto = auto_n_workers()
    if n_auto == 0:
        pytest.skip("host has <=2 usable cores; auto=inline by policy")

    chunks = [_chunk(rng, n=20_000, chrom=f"chr{1 + i % 3}")
              for i in range(8)]
    cols = ["chrom", "start", "end", "strand", "mut_type",
            "prob0", "prob1", "prob2", "prob3"]

    def run(n_workers, name):
        farm = PostprocessFarm(str(tmp_path / name), cols,
                               n_workers=n_workers)
        t0 = _time.time()
        for c in chunks:
            farm.submit(*c)
        farm.close()
        return _time.time() - t0

    run(n_auto, "warm.tsv.gz")          # pay worker spawn once
    t_inline = run(0, "inline.tsv.gz")
    t_fan = run(n_auto, "fan.tsv.gz")
    # generous margin: "not dramatically worse" is the do-no-harm bar;
    # real speedup is workload/core dependent
    assert t_fan < t_inline * 1.5, (t_fan, t_inline)


class Boom:
    def predict_proba(self, p):
        raise RuntimeError("boom")


def test_farm_worker_error_propagates(tmp_path, rng):
    from mural_tpu.predict.post_farm import PostprocessFarm

    farm = PostprocessFarm(str(tmp_path / "e.tsv.gz"),
                           ["chrom", "start", "end", "strand", "p0"],
                           calibrator=Boom(), n_workers=1)
    chrom, pos, neg, logits = _chunk(rng, n=8)
    farm.submit(chrom, pos, neg, logits)
    with pytest.raises(RuntimeError, match="postprocess worker failed"):
        farm.close()


def test_farm_calibrated_matches_direct(tmp_path, rng):
    """Farm output equals direct softmax->calibrator->format."""
    from mural_tpu import native
    from mural_tpu.calibrate.dirichlet import FullDirichletCalibrator
    from mural_tpu.predict.post_farm import PostprocessFarm

    probs_fit = rng.dirichlet([2.0] * 4, size=400)
    y_fit = rng.integers(0, 4, 400)
    cal = FullDirichletCalibrator().fit(probs_fit, y_fit)

    chrom, pos, neg, logits = _chunk(rng, n=200)
    out = str(tmp_path / "c.tsv")
    farm = PostprocessFarm(out, ["chrom", "start", "end", "strand",
                                 "prob0", "prob1", "prob2", "prob3"],
                           calibrator=cal)
    farm.submit(chrom, pos, neg, logits)
    farm.close()

    lg = logits.astype(np.float64)
    e = np.exp(lg - lg.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    expect = native.format_pred_tsv(chrom, pos, neg, cal.predict_proba(p))
    with open(out, "rb") as fh:
        fh.readline()  # header
        assert fh.read() == expect


@pytest.mark.slow
def test_farm_dead_worker_raises_instead_of_hanging(tmp_path, rng):
    """A worker killed by the OS (OOM/segfault) must surface as an
    error from close() within bounded time, not a forever-blocked
    wait_for (the submit path has the same liveness guard)."""
    from mural_tpu.predict.post_farm import PostprocessFarm

    farm = PostprocessFarm(str(tmp_path / "d.tsv.gz"),
                           ["chrom", "start", "end", "strand",
                            "mut_type", "prob0", "prob1", "prob2",
                            "prob3"], n_workers=1)
    farm._procs[0].terminate()
    farm._procs[0].join()
    chrom, pos, neg, logits = _chunk(rng, n=8)
    farm.submit(chrom, pos, neg, logits)   # queued, never processed
    with pytest.raises(RuntimeError, match="died|failed"):
        farm.close()
