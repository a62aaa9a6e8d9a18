"""Sorted-BED reading and segment grouping.

Re-implements the reference's ``bed_reader`` segmentation semantics
(``MuRaL/data/preprocessing.py:39-106``) without pybedtools: sites are
streamed in file order and grouped into ``central_bp``-sized windows per
chromosome; each emitted *segment* is single-strand (the '+' group of a
window is emitted before the '-' group).  Segment identity drives
segment-level batching, train/validation splitting and H5-style caching.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np


@dataclass
class BedSite:
    chrom: str
    start: int
    stop: int
    name: str
    label: int
    strand: str


class BedFile:
    """A parsed BED file held as column arrays (numpy, not pandas)."""

    def __init__(self, chroms: List[str], start: np.ndarray, stop: np.ndarray,
                 label: np.ndarray, strand: np.ndarray, path: str = ""):
        self.chrom = chroms                  # list[str], len N
        self.start = start                   # int64  (0-based)
        self.stop = stop                     # int64
        self.label = label                   # int32  (BED score column)
        self.strand = strand                 # bool, True == '-'
        self.path = path

    def __len__(self):
        return len(self.start)

    @classmethod
    def read(cls, path: str) -> "BedFile":
        opener = gzip.open if path.endswith(".gz") else open
        chroms: List[str] = []
        starts: List[int] = []
        stops: List[int] = []
        labels: List[int] = []
        strands: List[bool] = []
        with opener(path, "rt") as fh:
            for line in fh:
                if not line.strip() or line.startswith(("#", "track", "browser")):
                    continue
                f = line.split("\t")
                if len(f) < 6:
                    f = line.split()
                if len(f) < 6:
                    raise ValueError(
                        f"BED line needs >=6 fields (chrom start end name "
                        f"score strand): {line!r}")
                chroms.append(f[0])
                starts.append(int(f[1]))
                stops.append(int(f[2]))
                labels.append(int(float(f[3 + 1])))
                strands.append(f[5].strip() == "-")
        return cls(chroms, np.asarray(starts, dtype=np.int64),
                   np.asarray(stops, dtype=np.int64),
                   np.asarray(labels, dtype=np.int32),
                   np.asarray(strands, dtype=bool), path=path)


def segment_sites(bed: BedFile, central_bp: int) -> List[np.ndarray]:
    """Group site row-indices into single-strand segments.

    Parity with ``bed_reader(bed_regions, central_bp)`` (preprocessing.py:
    39-106): the first region opens a window [start, start+central_bp);
    a chromosome change resets the window to [1, 1+central_bp); a region
    with start beyond the window end closes the current segment(s)
    (emitting '+' rows then '-' rows) and slides the window forward in
    central_bp steps.  Returns a list of int64 index arrays into ``bed``;
    each array is single-strand and preserves file order.
    """
    segments: List[np.ndarray] = []
    n = len(bed)
    if n == 0:
        return segments

    pos_rows: List[int] = []
    neg_rows: List[int] = []

    def flush():
        if pos_rows:
            segments.append(np.asarray(pos_rows, dtype=np.int64))
            pos_rows.clear()
        if neg_rows:
            segments.append(np.asarray(neg_rows, dtype=np.int64))
            neg_rows.clear()

    chrom = bed.chrom[0]
    start0 = int(bed.start[0])
    end0 = start0 + central_bp

    for i in range(n):
        c, s = bed.chrom[i], int(bed.start[i])
        if c != chrom:
            flush()
            chrom = c
            start0 = 1
            end0 = 1 + central_bp
        if s > end0:
            flush()
            while s > end0:
                start0 = end0
                end0 += central_bp
        (neg_rows if bed.strand[i] else pos_rows).append(i)

    flush()
    return segments


def segment_strands(bed: BedFile, segments: List[np.ndarray]) -> np.ndarray:
    """Per-segment strand flags (True == '-')."""
    return np.asarray([bool(bed.strand[seg[0]]) for seg in segments])


def iter_position_rows(bed: BedFile, segments: List[np.ndarray]
                       ) -> Iterator[Tuple[str, int, int, str]]:
    """(chrom, start, end, strand) rows in segment-emission order.

    Matches ``get_position_info`` (preprocessing.py:108-121): positions are
    listed per segment, so the row order is identical to the order in which
    sites flow through the prediction pipeline.
    """
    for seg in segments:
        for i in seg:
            yield (bed.chrom[i], int(bed.start[i]), int(bed.stop[i]),
                   "-" if bed.strand[i] else "+")
