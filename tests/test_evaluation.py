"""Evaluator parity vs naive pandas-groupby reference semantics."""
import numpy as np
import pandas as pd
import pytest

from mural_tpu.evaluation import (Evaluator, calc_avg_prob, corr_calc_sub,
                                  freq_kmer_comp_multi)


def _fake_frame(n=2000, n_class=4, radius=3, seed=0):
    rng = np.random.default_rng(seed)
    cols = {}
    for i in range(radius, 0, -1):
        cols[f"us{i}"] = rng.integers(0, 4, n)
    cols["mid"] = np.zeros(n, dtype=int)
    for i in range(1, radius + 1):
        cols[f"ds{i}"] = rng.integers(0, 4, n)
    cols["mut_type"] = rng.integers(0, n_class, n)
    df = pd.DataFrame(cols)
    probs = rng.dirichlet(np.ones(n_class), size=n)
    for i in range(n_class):
        df[f"prob{i}"] = probs[:, i]
    return df


def _naive_kmer_corr(df, k, n_class):
    d = k // 2
    mer = [f"us{i}" for i in range(d, 0, -1)] + [f"ds{i+1}" for i in range(d)]
    out = []
    for i in range(n_class):
        g = pd.concat([df[mer + [f"prob{i}"]], df["mut_type"] == i],
                      axis=1).groupby(mer).mean()
        out.append(g["mut_type"].astype(float).corr(
            g[f"prob{i}"].astype(float)))
    return out


@pytest.mark.parametrize("k", [3, 5])
def test_kmer_corr_matches_groupby(k):
    df = _fake_frame()
    fast = freq_kmer_comp_multi(df, k, 4)
    naive = _naive_kmer_corr(df, k, 4)
    assert np.allclose(fast, naive, atol=1e-12, equal_nan=True)


def test_corr_calc_sub_windows():
    rng = np.random.default_rng(1)
    n = 500
    df = pd.DataFrame({
        "chrom": ["chr1"] * (n // 2) + ["chr2"] * (n - n // 2),
        "start": np.concatenate([np.sort(rng.integers(0, 100000, n // 2)),
                                 np.sort(rng.integers(0, 100000,
                                                      n - n // 2))]),
        "mut_type": rng.integers(0, 2, n),
    })
    probs = rng.dirichlet(np.ones(2), size=n)
    df["prob0"], df["prob1"] = probs[:, 0], probs[:, 1]
    corr = corr_calc_sub(df, 10000, ["prob0", "prob1"])
    assert len(corr) == 2
    # naive sequential-window reference
    keys = list(zip(df["chrom"], df["start"] // 10000))
    boundaries = [0] + [i for i in range(1, n) if keys[i] != keys[i - 1]] + [n]
    obs, pred = [], []
    for a, b in zip(boundaries[:-1], boundaries[1:]):
        obs.append((df["mut_type"].iloc[a:b] == 0).mean())
        pred.append(df["prob0"].iloc[a:b].mean())
    ref = np.corrcoef(obs, pred)[0, 1]
    assert corr[0] == pytest.approx(ref, abs=1e-12)


def test_calc_avg_prob():
    df = _fake_frame(100, 2)
    out = calc_avg_prob(df, 2)
    assert len(out) == 4
    assert out[0] + out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(df["prob0"].mean())


def test_evaluator_end_to_end():
    df = _fake_frame(12000)
    probs = df[[f"prob{i}" for i in range(4)]].to_numpy()
    lines = []
    ev = Evaluator(df.drop(columns=[f"prob{i}" for i in range(4)]),
                   probs, 4, printer=lambda *a: lines.append(a))
    kc = ev.evaluate_kmer([3, 5])
    assert set(kc) == {3, 5}
    score = ev.evaluate_regional_score(len(df), [3, 5])
    assert np.isfinite(score)
    # regional corr with positions
    rng = np.random.default_rng(2)
    chr_pos = pd.DataFrame({
        "chrom": ["chr1"] * len(df),
        "start": np.sort(rng.integers(0, 2_000_000, len(df))),
        "end": 0, "strand": "+",
    })
    chr_pos["end"] = chr_pos["start"] + 1
    rc = ev.evaluate_regional_corr(chr_pos, [100000])
    assert 100000 in rc and len(rc[100000]) == 4
    assert "score" in ev.metrics
