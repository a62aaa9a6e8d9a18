"""Continuous genome tracks (the reference's bigWig features).

The reference reads bigWig files with pyBigWig and feeds the mean value
over the radius-expanded region as continuous local features
(``get_mean_bw_for_bed``, MuRaL/data/preprocessing.py:725-750).  pyBigWig
is not available in this image, so :class:`TrackSet` supports:

- bedGraph / 4-column TSV files (``chrom start end value``, .gz ok),
  loaded into per-chromosome float32 arrays with a prefix-sum for O(1)
  range means;
- ``.npz`` archives of per-chromosome value arrays;
- ``.bw``/``.bigWig`` via pyBigWig when that package is installed.

The track list file format matches the reference ``--bw_paths`` file:
whitespace-separated ``path name [radius]`` rows, '#' comments
(training.py:130-144).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def read_track_list(path: str, default_radius: int):
    """Parse a --bw_paths file -> (files, names, radii).

    Mirrors training.py:130-144 incl. the default radius = local_radius
    when no third column is given.  An empty file yields empty lists.
    """
    files: List[str] = []
    names: List[str] = []
    radii: List[int] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            files.append(parts[0])
            names.append(parts[1] if len(parts) > 1 else parts[0])
            radii.append(int(parts[2]) if len(parts) > 2
                         else default_radius)
    return files, names, radii


class _Track:
    def __init__(self, cumsums: Dict[str, np.ndarray]):
        # cumsums[c][i] = sum of values[0:i]; len = chrom_len + 1
        self.cumsums = cumsums

    @classmethod
    def from_values(cls, values: Dict[str, np.ndarray]) -> "_Track":
        return cls({c: np.concatenate([[0.0], np.cumsum(
            np.nan_to_num(v, nan=0.0), dtype=np.float64)])
            for c, v in values.items()})

    @classmethod
    def load(cls, path: str) -> "_Track":
        if path.endswith((".bw", ".bigWig", ".bigwig")):
            try:
                import pyBigWig  # noqa: F401
            except ImportError:
                raise ImportError(
                    f"{path}: .bw tracks need pyBigWig, which is not "
                    "installed; convert to bedGraph (chrom start end "
                    "value) or .npz instead")
            bw = pyBigWig.open(path)
            values = {c: np.nan_to_num(
                bw.values(c, 0, n, numpy=True), nan=0.0)
                for c, n in bw.chroms().items()}
            return cls.from_values(values)
        if path.endswith(".npz"):
            data = np.load(path)
            return cls.from_values({k: data[k] for k in data.files})
        # bedGraph / TSV
        import gzip
        opener = gzip.open if path.endswith(".gz") else open
        per_chrom: Dict[str, List] = {}
        with opener(path, "rt") as fh:
            for line in fh:
                if not line.strip() or line.startswith(("#", "track")):
                    continue
                c, s, e, v = line.split()[:4]
                per_chrom.setdefault(c, []).append(
                    (int(s), int(e), float(v)))
        values = {}
        for c, rows in per_chrom.items():
            n = max(e for _, e, _ in rows)
            arr = np.zeros(n, dtype=np.float64)
            for s, e, v in rows:
                arr[s:e] = v
            values[c] = arr
        return cls.from_values(values)

    def mean(self, chrom: str, start: int, stop: int) -> float:
        """Mean over [start, stop) clipped to the chromosome
        (ref get_mean_bw_for_bed: start1=max(start,0),
        stop1=min(stop, chrom_len))."""
        cs = self.cumsums.get(chrom)
        if cs is None:
            return 0.0
        n = len(cs) - 1
        lo, hi = max(start, 0), min(stop, n)
        if hi <= lo:
            return 0.0
        return float((cs[hi] - cs[lo]) / (hi - lo))


class TrackSet:
    def __init__(self, files: Sequence[str], names: Sequence[str],
                 radii: Sequence[int]):
        self.files = list(files)
        self.names = list(names)
        self.radii = list(radii)
        self.tracks = [_Track.load(f) for f in files]

    def __len__(self):
        return len(self.tracks)

    def mean_over_sites(self, chroms: Sequence[str], starts: np.ndarray,
                        stops: np.ndarray,
                        model_type: str = "snv") -> np.ndarray:
        """(n_sites, n_tracks) mean values over radius-expanded regions
        (ref preprocessing.py:725-750)."""
        from mural_tpu.genome.encode import expanded_start
        n = len(starts)
        out = np.zeros((n, len(self.tracks)), dtype=np.float64)
        for j, (tr, r) in enumerate(zip(self.tracks, self.radii)):
            s = expanded_start(starts, r, model_type)
            if model_type == "snv":
                e = np.asarray(stops) + r
            else:
                e = np.asarray(stops) + r
            for i in range(n):
                out[i, j] = tr.mean(chroms[i], int(s[i]), int(e[i]))
        return out
