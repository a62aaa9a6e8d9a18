"""Continuous genome tracks (the reference's bigWig features).

The reference reads bigWig files with pyBigWig random access and feeds
the mean value over the radius-expanded region as continuous local
features (``get_mean_bw_for_bed``, MuRaL/data/preprocessing.py:725-750);
a per-base reader exists but is unused (``get_bw_for_bed``, :147-186).
pyBigWig is not available in this image, so tracks are stored in a
genome-scale-ready two-level prefix-sum structure instead:

- **block prefixes**: ``float64`` running sums every ``K=4096`` bases —
  ~6 MB per human-sized chromosome, always in RAM, exact at genome scale;
- **in-block cumsums**: ``float32`` partial sums that reset each block
  (≤4096 addends keeps float32 exact to ~1e-5 relative), memmapped on
  disk when a cache dir is used, so resident memory stays bounded at any
  genome size (the round-1 design held whole-chromosome float64 cumsums
  — ~25 GB/track for human — and answered queries in a per-site Python
  loop; both are gone).

``sum(lo, hi) = S(hi) - S(lo)`` with
``S(p) = block_prefix[p // K] + inblock[p]`` — every query is two fancy
gathers, fully vectorised over sites.  Per-base window extraction
(``distal_windows``) diffs S over a (sites, width+1) index grid, giving
the per-base distal track channels the reference promises but cannot
deliver (its NP pipeline only ever emits 4 channels; PARITY.md).

Accepted formats: bedGraph / 4-column TSV (``chrom start end value``,
.gz ok; parsed vectorised with pandas), ``.npz`` per-chromosome value
archives, and ``.bw`` via pyBigWig when installed.  The track list file
format matches the reference ``--bw_paths`` file: whitespace-separated
``path name [radius]`` rows, '#' comments (training.py:130-144).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_K = 4096                    # block size (bases per float32 reset)
_BUILD_CHUNK = 1 << 22       # streaming build granularity (multiple of K)


class PrefixTrack:
    """One track: per-chromosome two-level prefix sums."""

    def __init__(self, chroms: Dict[str, Tuple[np.ndarray, np.ndarray]]):
        # chroms[c] = (block_prefix float64 [n_blocks+1], inblock
        # float32 [n]); block_prefix[-1] = total sum = S(n)
        self.chroms = chroms

    # -- construction ----------------------------------------------------

    @classmethod
    def from_intervals(cls, intervals: Dict[str, tuple],
                       cache_dir: Optional[str] = None) -> "PrefixTrack":
        """Build from per-chromosome (starts, ends, values) interval
        arrays.  Overlapping intervals add (bedGraph intervals are
        disjoint, where this equals the reference's assignment
        semantics).  RAM during the build is bounded by _BUILD_CHUNK
        regardless of chromosome size."""
        chroms = {}
        for chrom, (starts, ends, vals) in intervals.items():
            starts = np.asarray(starts, dtype=np.int64)
            ends = np.asarray(ends, dtype=np.int64)
            vals = np.asarray(vals, dtype=np.float64)
            n = int(ends.max()) if len(ends) else 0
            n_blocks = -(-n // _K) if n else 0
            block_prefix = np.zeros(n_blocks + 1, dtype=np.float64)
            if cache_dir is not None:
                os.makedirs(cache_dir, exist_ok=True)
                inblock = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"{chrom}.inblock.npy"),
                    mode="w+", dtype=np.float32, shape=(n,))
            else:
                inblock = np.empty(n, dtype=np.float32)
            running = 0.0
            for c0 in range(0, n, _BUILD_CHUNK):
                c1 = min(c0 + _BUILD_CHUNK, n)
                delta = np.zeros(c1 - c0 + 1, dtype=np.float64)
                s = np.clip(starts, c0, c1) - c0
                e = np.clip(ends, c0, c1) - c0
                keep = s < e
                np.add.at(delta, s[keep], vals[keep])
                np.add.at(delta, e[keep], -vals[keep])
                # first cumsum turns interval deltas into per-base
                # values, second turns values into prefix sums:
                # cum0[j] = sum of values[c0 : c0+j)
                cum0 = np.concatenate(
                    [[0.0], np.cumsum(np.cumsum(delta[:-1]))])
                bs = np.arange(c0 // _K, -(-c1 // _K))
                block_prefix[bs] = running + cum0[
                    np.minimum(bs * _K - c0, c1 - c0)]
                idx = np.arange(c0, c1)
                inblock[c0:c1] = (running + cum0[idx - c0]
                                  - block_prefix[idx // _K]
                                  ).astype(np.float32)
                running += cum0[-1]
            block_prefix[n_blocks] = running
            chroms[chrom] = (block_prefix, inblock)
        return cls(chroms)

    @classmethod
    def from_values(cls, values: Dict[str, np.ndarray],
                    cache_dir: Optional[str] = None) -> "PrefixTrack":
        """Build from dense per-base value arrays.  Chunked: peak extra
        memory and per-pass array sizes stay at _BUILD_CHUNK regardless
        of chromosome length."""
        chroms = {}
        for chrom, v in values.items():
            v = np.asarray(v)
            n = len(v)
            n_blocks = -(-n // _K) if n else 0
            block_prefix = np.zeros(n_blocks + 1, dtype=np.float64)
            if cache_dir is not None:
                os.makedirs(cache_dir, exist_ok=True)
                inblock = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"{chrom}.inblock.npy"),
                    mode="w+", dtype=np.float32, shape=(n,))
            else:
                inblock = np.empty(n, dtype=np.float32)
            running = 0.0
            for c0 in range(0, n, _BUILD_CHUNK):
                c1 = min(c0 + _BUILD_CHUNK, n)
                part = np.nan_to_num(v[c0:c1].astype(np.float64),
                                     nan=0.0)
                cum0 = np.concatenate([[0.0], np.cumsum(part)])
                bs = np.arange(c0 // _K, -(-c1 // _K))
                block_prefix[bs] = running + cum0[
                    np.minimum(bs * _K - c0, c1 - c0)]
                idx = np.arange(c0, c1)
                inblock[c0:c1] = (running + cum0[idx - c0]
                                  - block_prefix[idx // _K]
                                  ).astype(np.float32)
                running += cum0[-1]
            block_prefix[n_blocks] = running
            chroms[chrom] = (block_prefix, inblock)
        return cls(chroms)

    @classmethod
    def load(cls, path: str,
             cache_dir: Optional[str] = None) -> "PrefixTrack":
        """Load a track file, using/creating an on-disk cache when
        ``cache_dir`` is given (default: ``<path>.mural_cache`` for
        bedGraph/TSV inputs — memmapped, so RAM stays bounded)."""
        if cache_dir is None and not path.endswith(".npz"):
            cache_dir = path + ".mural_cache"
        if cache_dir is not None:
            cached = cls._load_cache(path, cache_dir)
            if cached is not None:
                return cached

        if path.endswith((".bw", ".bigWig", ".bigwig")):
            try:
                import pyBigWig  # noqa: F401
            except ImportError:
                raise ImportError(
                    f"{path}: .bw tracks need pyBigWig, which is not "
                    "installed; convert to bedGraph (chrom start end "
                    "value) or .npz instead")
            bw = pyBigWig.open(path)
            track = cls.from_values(
                {c: np.nan_to_num(bw.values(c, 0, n, numpy=True),
                                  nan=0.0)
                 for c, n in bw.chroms().items()}, cache_dir)
        elif path.endswith(".npz"):
            data = np.load(path)
            track = cls.from_values({k: data[k] for k in data.files},
                                    cache_dir)
        else:
            # bedGraph / TSV, vectorised parse
            import pandas as pd
            df = pd.read_csv(path, sep=r"\s+", header=None, comment="#",
                             usecols=[0, 1, 2, 3],
                             names=["chrom", "start", "end", "value"],
                             dtype={"chrom": str})
            df = df[df.chrom != "track"]
            intervals = {
                str(c): (g["start"].to_numpy(np.int64),
                         g["end"].to_numpy(np.int64),
                         g["value"].to_numpy(np.float64))
                for c, g in df.groupby("chrom", sort=False)}
            track = cls.from_intervals(intervals, cache_dir)
        if cache_dir is not None:
            track._write_cache_meta(path, cache_dir)
        return track

    # -- cache -----------------------------------------------------------

    @staticmethod
    def _fingerprint(path: str) -> dict:
        st = os.stat(path)
        return {"src": os.path.abspath(path), "mtime": st.st_mtime,
                "size": st.st_size, "block": _K}

    def _write_cache_meta(self, path: str, cache_dir: str) -> None:
        os.makedirs(cache_dir, exist_ok=True)
        for chrom, (bp, ib) in self.chroms.items():
            np.save(os.path.join(cache_dir, f"{chrom}.blocks.npy"), bp)
            if not isinstance(ib, np.memmap):
                mm = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"{chrom}.inblock.npy"),
                    mode="w+", dtype=np.float32, shape=ib.shape)
                mm[:] = ib
                self.chroms[chrom] = (bp, mm)
        meta = self._fingerprint(path)
        meta["chroms"] = sorted(self.chroms)
        tmp = os.path.join(cache_dir, "meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(cache_dir, "meta.json"))

    @classmethod
    def _load_cache(cls, path: str,
                    cache_dir: str) -> Optional["PrefixTrack"]:
        meta_path = os.path.join(cache_dir, "meta.json")
        if not os.path.exists(meta_path):
            return None
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            return None
        if meta.get("block") != _K:
            return None
        fp = cls._fingerprint(path)
        if (meta.get("mtime") != fp["mtime"]
                or meta.get("size") != fp["size"]):
            return None
        chroms = {}
        for chrom in meta.get("chroms", []):
            bp_p = os.path.join(cache_dir, f"{chrom}.blocks.npy")
            ib_p = os.path.join(cache_dir, f"{chrom}.inblock.npy")
            if not (os.path.exists(bp_p) and os.path.exists(ib_p)):
                return None
            chroms[chrom] = (np.load(bp_p),
                             np.load(ib_p, mmap_mode="r"))
        return cls(chroms)

    # -- queries (all vectorised) -----------------------------------------

    def _prefix(self, chrom: str, p: np.ndarray) -> np.ndarray:
        """S(p) = sum of values[0:p) for an int array p in [0, n]."""
        bp, ib = self.chroms[chrom]
        n = len(ib)
        p = np.clip(p, 0, n)
        inner = np.asarray(ib[np.minimum(p, max(n - 1, 0))],
                           dtype=np.float64) if n else 0.0
        s = bp[p // _K] + inner
        return np.where(p >= n, bp[-1], s)

    def mean_ranges(self, chrom: str, starts: np.ndarray,
                    stops: np.ndarray) -> np.ndarray:
        """Vectorised mean over [start, stop) clipped to the chromosome
        (ref get_mean_bw_for_bed: start1=max(start,0),
        stop1=min(stop, chrom_len)).  Unknown chromosome -> zeros."""
        starts = np.asarray(starts, dtype=np.int64)
        stops = np.asarray(stops, dtype=np.int64)
        if chrom not in self.chroms:
            return np.zeros(len(starts), dtype=np.float64)
        bp, ib = self.chroms[chrom]
        from mural_tpu import native
        fast = native.track_mean(bp, ib, starts, stops, _K)
        if fast is not None:
            return fast
        n = len(ib)
        lo = np.clip(starts, 0, n)
        hi = np.clip(stops, 0, n)
        width = hi - lo
        total = self._prefix(chrom, hi) - self._prefix(chrom, lo)
        return np.where(width > 0, total / np.maximum(width, 1), 0.0)

    def mean(self, chrom: str, start: int, stop: int) -> float:
        return float(self.mean_ranges(chrom, np.asarray([start]),
                                      np.asarray([stop]))[0])

    def window_values(self, chrom: str, starts: np.ndarray,
                      width: int, neg: Optional[np.ndarray] = None
                      ) -> np.ndarray:
        """(n_sites, width) float32 per-base values; positions outside
        the chromosome read 0.  Rows with ``neg`` set are reversed so the
        track stays aligned with reverse-complemented one-hot windows.

        Values are reconstructed as S(p+1)-S(p) from float32 in-block
        partial sums: absolute precision ~1e-4 x block mean magnitude,
        negligible for coverage-style tracks."""
        starts = np.asarray(starts, dtype=np.int64)
        if chrom not in self.chroms:
            return np.zeros((len(starts), width), dtype=np.float32)
        grid = starts[:, None] + np.arange(width + 1)[None, :]
        s = self._prefix(chrom, grid.ravel()).reshape(grid.shape)
        vals = np.diff(s, axis=1).astype(np.float32)
        if neg is not None and np.any(neg):
            vals[np.asarray(neg, bool)] = vals[np.asarray(neg, bool),
                                               ::-1]
        return vals


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


# round-1 compatibility alias (old name, same query surface)
_Track = PrefixTrack


class TrackSet:
    def __init__(self, files: Sequence[str], names: Sequence[str],
                 radii: Sequence[int],
                 cache_dir: Optional[str] = None):
        self.files = list(files)
        self.names = list(names)
        self.radii = list(radii)
        self.tracks = [PrefixTrack.load(f, cache_dir) for f in files]

    def __len__(self):
        return len(self.tracks)

    def mean_over_sites(self, chroms: Sequence[str], starts: np.ndarray,
                        stops: np.ndarray,
                        model_type: str = "snv") -> np.ndarray:
        """(n_sites, n_tracks) mean values over radius-expanded regions
        (ref preprocessing.py:725-750).  Vectorised: sites are grouped
        by chromosome, then each group is two prefix gathers."""
        from mural_tpu.genome.encode import expanded_start
        chrom_arr = np.asarray(chroms)
        starts = np.asarray(starts, dtype=np.int64)
        stops = np.asarray(stops, dtype=np.int64)
        out = np.zeros((len(starts), len(self.tracks)), dtype=np.float64)
        for chrom in np.unique(chrom_arr) if len(chrom_arr) else []:
            sel = np.nonzero(chrom_arr == chrom)[0]
            for j, (tr, r) in enumerate(zip(self.tracks, self.radii)):
                s = expanded_start(starts[sel], r, model_type)
                e = stops[sel] + r
                out[sel, j] = tr.mean_ranges(str(chrom), s, e)
        return out

    def distal_windows(self, chrom: str, starts: np.ndarray, width: int,
                       neg: Optional[np.ndarray] = None) -> np.ndarray:
        """(n_sites, width, n_tracks) float32 per-base values for distal
        track channels -- the capability the reference's
        training.py:258-260 promises (in_channels = 4**distal_order +
        n_cont) but its pipeline never delivers (PARITY.md)."""
        out = np.empty((len(starts), width, len(self.tracks)),
                       dtype=np.float32)
        for j, tr in enumerate(self.tracks):
            out[:, :, j] = tr.window_values(chrom, starts, width, neg)
        return out
