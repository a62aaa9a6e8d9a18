"""Mutation-rate scaling (ref MuRaL/scripts/scaling.py).

``apply_scaling``: multiply the mutated-class probabilities by a factor
and reset prob0 = 1 - sum(mutated) (:11-29).  ``calc_mu_scaling_factor``:
factor = genomewide_mu * n_sites * m_proportion / g_proportion / sum of
predicted mutated probability, optionally restricted to benchmark
regions (:44-107).  The pybedtools intersect is replaced by a numpy
interval-overlap test.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

import numpy as np


def apply_scaling(pred_file: str, scale_factor: float, n_class: int,
                  out_file: str) -> None:
    import pandas as pd
    df = pd.read_csv(pred_file, sep="\t", header=0)
    cols = [f"prob{i}" for i in range(1, n_class)]
    df[cols] = df[cols].astype(float) * scale_factor
    df["prob0"] = 1 - df[cols].sum(axis=1)
    df.to_csv(out_file, sep="\t", index=False, float_format="%.4g")


def scaling_files(pred_files: List[str], scale_factors: List[float],
                  n_class: int, out_files: List[str]) -> None:
    for pred_file, factor, out_file in zip(pred_files, scale_factors,
                                           out_files):
        apply_scaling(pred_file, factor, n_class, out_file)


def _load_regions(bed_path: str) -> Dict[str, np.ndarray]:
    """chrom -> sorted (n, 2) interval array."""
    import gzip
    opener = gzip.open if bed_path.endswith(".gz") else open
    per: Dict[str, List] = {}
    with opener(bed_path, "rt") as fh:
        for line in fh:
            if not line.strip() or line.startswith(("#", "track")):
                continue
            f = line.split()
            per.setdefault(f[0], []).append((int(f[1]), int(f[2])))
    out = {}
    for c, v in per.items():
        iv = np.asarray(sorted(v), dtype=np.int64)
        # merge overlapping/nested intervals so the membership test below
        # is exact (equivalent to bedtools intersect for overlap queries)
        merged = [iv[0].tolist()]
        for s_, e_ in iv[1:]:
            if s_ <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e_)
            else:
                merged.append([s_, e_])
        out[c] = np.asarray(merged, dtype=np.int64)
    return out


def _in_regions(chroms, starts, ends, regions: Dict[str, np.ndarray]
                ) -> np.ndarray:
    """True where [start, end) overlaps any region (bedtools intersect
    default semantics: >= 1bp overlap)."""
    mask = np.zeros(len(starts), dtype=bool)
    chroms = np.asarray(chroms)
    for c in np.unique(chroms):
        iv = regions.get(c)
        m = chroms == c
        if iv is None or not len(iv):
            continue
        s, e = starts[m], ends[m]
        # intervals are merged and disjoint: the only candidate is the
        # last region starting before the site's end
        idx = np.searchsorted(iv[:, 0], e - 1, side="right") - 1
        ok = idx >= 0
        hit = np.zeros(m.sum(), dtype=bool)
        hit[ok] = iv[idx[ok], 1] > s[ok]
        mask[m] = hit
    return mask


def calc_mu_scaling_factor(pred_files: List[str], genomewide_mu: float,
                           m_proportions: List[float],
                           n_class: int, model_type: str = "snv",
                           g_proportions: Optional[List[float]] = None,
                           benchmark_regions: Optional[str] = None,
                           do_scaling: bool = False,
                           printer=print) -> float:
    import pandas as pd
    if g_proportions is None or model_type != "snv":
        g_proportions = [1] * len(pred_files)
    if len(m_proportions) != len(pred_files):
        raise ValueError("length of proportions does not equal to length "
                         "of pred_files!")
    regions = _load_regions(benchmark_regions) if benchmark_regions else None

    scale_factor = None
    for i, pred_file in enumerate(pred_files):
        df = pd.read_csv(pred_file, sep="\t", header=0)
        prob_cols = [f"prob{j}" for j in range(1, n_class)]
        score = df[prob_cols].sum(axis=1).to_numpy()
        if regions is not None:
            m = _in_regions(df["chrom"].to_numpy(),
                            df["start"].to_numpy(np.int64),
                            df["end"].to_numpy(np.int64), regions)
            score = score[m]
        prob_sum = float(np.sum(score))
        n_sites = len(score)
        if prob_sum == 0.0:
            raise ValueError(
                f"no prediction mass selected from {pred_file} "
                f"({n_sites} sites matched"
                + (f" benchmark regions {benchmark_regions} -- check "
                   f"that chromosome naming matches the prediction "
                   f"file (e.g. 'chr1' vs '1')" if regions is not None
                   else "") + ")")
        scale_factor = (genomewide_mu * n_sites * m_proportions[i]
                        / g_proportions[i]) / prob_sum
        printer(f"\nType {i + 1}:\npred_file: {pred_file}")
        printer("genomewide_mu:", genomewide_mu)
        printer("n_sites:", n_sites)
        printer("g_proportion:", g_proportions[i])
        printer("m_proportion:", m_proportions[i])
        printer("prob_sum: %.3e" % prob_sum)
        printer("scaling factor: %.3e" % scale_factor)
        if do_scaling:
            apply_scaling(pred_file, scale_factor, n_class,
                          pred_file + ".scaled.tsv.gz")
    return scale_factor
