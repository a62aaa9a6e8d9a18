"""File-level evaluation pipelines for the ``evaluate`` sub-command.

Re-implements the reference's streaming scripts with chunked, vectorized
per-chromosome processing over the uint8 genome codes:

- k-mer correlation      (MuRaL/scripts/calc_kmer_corr.py:194-271)
- regional correlation   (calc_regional_corr.py:168-213)
- motif correlation      (calc_motif_corr.py:191-260; the reference
  crashes on a namespace bug at :239 -- fixed here)

Prediction TSVs stream in bounded-memory chunks (the inputs are
genome-wide, up to billions of rows), accumulating obs counts / prob
sums per k-mer or window exactly like the reference's line loops.
Output file naming and column schemas match the reference:
``<prefix>.<k>-mer.mut_rates.tsv`` / ``.corr.txt``,
``<prefix>.<N>Kb.mut_rates.tsv`` / ``.corr.txt``,
``<prefix>.<k>-motif.mut_rates.tsv`` / ``.corr.txt``.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import COMPLEMENT, Genome, decode_sequence

CHUNK_ROWS = 2_000_000


def _iter_pred(pred_file: str, n_class: int):
    """Yield prediction-file chunks with header/schema validation
    (ref calc_kmer_corr.py:209-218)."""
    import pandas as pd
    reader = pd.read_csv(pred_file, sep="\t", chunksize=CHUNK_ROWS)
    first = True
    for chunk in reader:
        if first:
            if chunk.columns[0] != "chrom":
                raise ValueError(
                    f"Invalid file header: {list(chunk.columns)}; "
                    "first column should be 'chrom'")
            if len(chunk.columns) != n_class + 5:
                raise ValueError(
                    f"Column count mismatch. Expected {n_class + 5} "
                    f"columns, got {len(chunk.columns)}")
            first = False
        yield chunk


def _extend_interval(start, stop, left, right, model_type):
    """(ref preprocessing.py:559-567) asymmetric-radius window."""
    if model_type == "snv":
        return start - left, stop + right
    return start - left + 1, stop + right


def _gather_kmers(genome: Genome, df, left: int, right: int, width: int,
                  model_type: str):
    """Per-row k-mer codes (n, width) plus validity mask (ACGT-only and
    fully inside the chromosome)."""
    n = len(df)
    out = np.full((n, width), 14, dtype=np.uint8)
    inside = np.zeros(n, dtype=bool)
    chroms = df["chrom"].to_numpy()
    starts = df["start"].to_numpy().astype(np.int64)
    stops = df["end"].to_numpy().astype(np.int64)
    s0, e0 = _extend_interval(starts, stops, left, right, model_type)
    for c in np.unique(chroms):
        m = chroms == c
        if c not in genome:
            continue
        codes = genome[c]
        out[m] = enc.gather_windows(codes, s0[m], width,
                                    np.zeros(m.sum(), bool))
        inside[m] = (s0[m] >= 0) & (s0[m] + width <= len(codes))
    # rows whose own window length differs from the k-mer width (e.g.
    # multi-base INDEL gap rows, end - start > 1) are skipped like the
    # reference's len(seq) != kmer_length check (calc_kmer_corr.py:
    # 235-241) rather than scored with a start-anchored wrong window
    valid = inside & (e0 - s0 == width) & (out < 4).all(axis=1)
    return out, valid


def _pack(codes: np.ndarray) -> np.ndarray:
    key = np.zeros(len(codes), dtype=np.int64)
    for j in range(codes.shape[1]):
        key = key * 4 + codes[:, j]
    return key


def _revcomp_key(codes: np.ndarray) -> np.ndarray:
    return _pack(COMPLEMENT[codes][:, ::-1])


def _key_to_kmer(key: int, k: int) -> str:
    digits = []
    for _ in range(k):
        digits.append(key % 4)
        key //= 4
    return decode_sequence(np.asarray(digits[::-1], dtype=np.uint8))


class _Accumulator:
    """Per-key obs counts and prob sums (chunk-incremental)."""

    def __init__(self, n_keys: int, n_class: int):
        self.obs = np.zeros((n_keys, n_class))
        self.pred = np.zeros((n_keys, n_class))
        self.n_class = n_class

    def add(self, keys, mut, probs):
        n_keys = self.obs.shape[0]
        for i in range(self.n_class):
            self.obs[:, i] += np.bincount(
                keys, weights=(mut == i).astype(np.float64),
                minlength=n_keys)
            self.pred[:, i] += np.bincount(keys, weights=probs[:, i],
                                           minlength=n_keys)


def _rates_frame(obs: np.ndarray, pred: np.ndarray, n_class: int):
    """Shared mut_rates.tsv column assembly
    (ref calc_kmer_corr.py:124-163 / calc_regional_corr.py:83-140)."""
    import pandas as pd
    total = obs.sum(axis=1)
    data = np.concatenate([obs[:, 1:] / total[:, None],
                           pred[:, 1:] / total[:, None],
                           obs[:, 1:], total[:, None]], axis=1)
    names = ([f"avg_obs_rate{i}" for i in range(1, n_class)]
             + [f"avg_pred_rate{i}" for i in range(1, n_class)]
             + [f"number_of_mut{i}" for i in range(1, n_class)]
             + ["number_of_all"])
    df = pd.DataFrame(data, columns=names)
    for c in names[2 * (n_class - 1):]:
        df[c] = df[c].astype(int)
    return df


def _correlations(df, n_class: int) -> Dict[int, Tuple[float, float]]:
    from scipy.stats import pearsonr
    return {i: tuple(pearsonr(df[f"avg_obs_rate{i}"],
                              df[f"avg_pred_rate{i}"]))
            for i in range(1, n_class)}


def _write_corr(path: str, tag: str, corr, printer) -> None:
    with open(path, "w") as fh:
        for subtype, (c, p) in corr.items():
            fh.write(f"{tag}\t{subtype}\t{c:.5f}\t{p:.10e}\n")
    for subtype, (c, p) in corr.items():
        printer(f"{tag} subtype {subtype}: r={c:.5f} p={p:.3e}")


def run_kmer_corr(pred_file: str, ref_genome: str, out_prefix: str,
                  kmer_length: int, n_class: int, model_type: str = "snv",
                  strand_override: Optional[str] = None, genome=None,
                  printer=print) -> Dict[int, Tuple[float, float]]:
    """k-mer obs/pred correlation (ref calc_kmer_corr.py).

    ``strand_override``: INDEL mode replaces per-row strand with the CLI
    --strand value ('+', '-' or 'both'; ref :223-224)."""
    if model_type == "indel":
        # INDEL windows span the gap: width = 2*(k//2) needs EVEN k
        # (reference defaults 2/4/6, MuRaL/commands/evaluate.py:146)
        if kmer_length <= 0 or kmer_length % 2 != 0:
            raise ValueError("--kmer_length must be a positive even "
                             "integer for INDEL evaluation")
    elif kmer_length <= 1 or kmer_length % 2 != 1:
        raise ValueError("--kmer_length must be a positive odd integer >1")
    genome = genome or Genome.from_fasta(ref_genome)
    radius = kmer_length // 2
    acc = _Accumulator(4 ** kmer_length, n_class)

    for df in _iter_pred(pred_file, n_class):
        codes, valid = _gather_kmers(genome, df, radius, radius,
                                     kmer_length, model_type)
        mut = df["mut_type"].to_numpy().astype(np.int64)
        probs = df[[f"prob{i}" for i in range(n_class)]].to_numpy(
            np.float64)
        if strand_override and model_type == "indel":
            strand = np.full(len(df), strand_override)
        else:
            strand = df["strand"].to_numpy()
        fwd_key = _pack(codes)
        rev_key = _revcomp_key(codes)
        plus = valid & ((strand == "+") | (strand == "both"))
        minus = valid & ((strand == "-") | (strand == "both"))
        if plus.any():
            acc.add(fwd_key[plus], mut[plus], probs[plus])
        if minus.any():
            acc.add(rev_key[minus], mut[minus], probs[minus])

    present = acc.obs.sum(axis=1) > 0
    rates = _rates_frame(acc.obs[present], acc.pred[present], n_class)
    rates.insert(0, "type", [_key_to_kmer(i, kmer_length)
                             for i in np.nonzero(present)[0]])
    corr = _correlations(rates, n_class)
    rates.to_csv(f"{out_prefix}.{kmer_length}-mer.mut_rates.tsv",
                 sep="\t", index=False)
    _write_corr(f"{out_prefix}.{kmer_length}-mer.corr.txt",
                f"{kmer_length}-mer", corr, printer)
    return corr


def run_regional_corr(pred_file: str, out_prefix: str, window_size: int,
                      ratio_cutoff: float, n_class: int,
                      printer=print) -> Dict[int, Tuple[float, float]]:
    """Regional obs/pred correlation with median-based window filtering
    (ref calc_regional_corr.py:168-213).  Streams the prediction file;
    windows are keyed by (chrom, window_end) like the reference's dict."""
    key_index: Dict[Tuple[str, int], int] = {}
    obs = np.zeros((0, n_class))
    pred = np.zeros((0, n_class))

    for df in _iter_pred(pred_file, n_class):
        window_end = (df["start"].to_numpy().astype(np.int64)
                      // window_size * window_size + window_size)
        chroms = df["chrom"].to_numpy()
        mut = df["mut_type"].to_numpy().astype(np.int64)
        probs = df[[f"prob{i}" for i in range(n_class)]].to_numpy(
            np.float64)
        # map chunk rows to stable global window ids
        import pandas as pd
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_arrays([chroms, window_end]))
        gids = np.empty(len(uniques), dtype=np.int64)
        for j, u in enumerate(uniques):
            gids[j] = key_index.setdefault((u[0], int(u[1])),
                                           len(key_index))
        if len(key_index) > obs.shape[0]:
            grow = len(key_index) - obs.shape[0]
            obs = np.vstack([obs, np.zeros((grow, n_class))])
            pred = np.vstack([pred, np.zeros((grow, n_class))])
        g = gids[codes]
        for i in range(n_class):
            obs[:, i] += np.bincount(g, weights=(mut == i).astype(float),
                                     minlength=obs.shape[0])
            pred[:, i] += np.bincount(g, weights=probs[:, i],
                                      minlength=obs.shape[0])
    out = _rates_frame(obs, pred, n_class)
    keys = list(key_index.keys())
    out.insert(0, "chrom", [k[0] for k in keys])
    out.insert(1, "window_end", [k[1] for k in keys])

    cutoff = ratio_cutoff * np.median(out["number_of_all"].to_numpy())
    out["used_or_deprecated"] = np.where(
        out["number_of_all"] >= cutoff, "used", "deprecated")
    used = out[out["used_or_deprecated"] == "used"]
    corr = _correlations(used, n_class)

    kb = f"{window_size // 1000}Kb"
    out.to_csv(f"{out_prefix}.{kb}.mut_rates.tsv", sep="\t", index=False)
    _write_corr(f"{out_prefix}.{kb}.corr.txt", kb, corr, printer)
    return corr


def run_motif_corr(pred_file: str, ref_genome: str, out_prefix: str,
                   motif_length: int, n_class: int,
                   model_type: str = "indel", merge_reverse: bool = True,
                   genome=None, printer=print
                   ) -> Dict[int, Tuple[float, float]]:
    """Motif correlation: every motif placement covering the site counts
    (ref calc_motif_corr.py:191-260).  Reverse-complement motif pairs are
    merged into one canonical key (the reference's KmerMutSaver defaults
    to merge_reverse=True and merges into whichever orientation it saw
    first, :48-69; we use the lexicographically smaller key -- the
    partition, and therefore the correlations, are identical)."""
    if model_type == "indel":
        # gap-spanning placements (left + right == motif_length) work
        # for any length >= 2; the reference default is 6
        if motif_length < 2:
            raise ValueError("--motif_length must be an integer >=2")
    elif motif_length <= 1 or motif_length % 2 != 1:
        raise ValueError("--motif_length must be a positive odd integer >1")
    genome = genome or Genome.from_fasta(ref_genome)

    if model_type == "indel":
        placements = [(i, motif_length - i) for i in range(1, motif_length)]
    else:
        placements = [(i, motif_length - 1 - i) for i in range(motif_length)]

    acc = _Accumulator(4 ** motif_length, n_class)
    for df in _iter_pred(pred_file, n_class):
        mut = df["mut_type"].to_numpy().astype(np.int64)
        probs = df[[f"prob{i}" for i in range(n_class)]].to_numpy(
            np.float64)
        for left, right in placements:
            codes, valid = _gather_kmers(genome, df, left, right,
                                         motif_length, model_type)
            if not valid.any():
                continue
            key = _pack(codes[valid])
            if merge_reverse:
                key = np.minimum(key, _revcomp_key(codes[valid]))
            acc.add(key, mut[valid], probs[valid])

    present = acc.obs.sum(axis=1) > 0
    rates = _rates_frame(acc.obs[present], acc.pred[present], n_class)
    rates.insert(0, "type", [_key_to_kmer(i, motif_length)
                             for i in np.nonzero(present)[0]])
    corr = _correlations(rates, n_class)
    rates.to_csv(f"{out_prefix}.{motif_length}-motif.mut_rates.tsv",
                 sep="\t", index=False)
    _write_corr(f"{out_prefix}.{motif_length}-motif.corr.txt",
                f"{motif_length}-motif", corr, printer)
    return corr
