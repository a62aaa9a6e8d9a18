"""FASTA loading into compact per-chromosome uint8 code arrays.

TPU-first design: instead of keeping the genome as Python strings and
encoding windows char-by-char (the reference's host hot loop,
``MuRaL/data/preprocessing.py:636-723`` and ``:756-816``), we encode each
chromosome ONCE into a ``uint8`` array of IUPAC symbol classes.  Window
extraction then becomes an integer gather, and one-hot / k-mer encodings
are tiny table lookups that can run vectorized on host or on device.

Code space (15 classes; anything unrecognised maps to N):

====  ======  =================
code  symbol  meaning
====  ======  =================
0     A
1     C
2     G
3     T       (U maps here too)
4     R       A/G
5     Y       C/T
6     M       A/C
7     S       C/G
8     W       A/T
9     K       G/T
10    B       not A
11    D       not C
12    H       not G
13    V       not T
14    N       any / unknown
====  ======  =================
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Dict, Iterator, Tuple

import numpy as np

A, C, G, T = 0, 1, 2, 3
N_CODE = 14
NUM_CODES = 15

_SYMBOLS = "ACGTRYMSWKBDHVN"

# 256-entry byte -> code lookup table (upper and lower case).
_BYTE_LUT = np.full(256, N_CODE, dtype=np.uint8)
for _i, _ch in enumerate(_SYMBOLS):
    _BYTE_LUT[ord(_ch)] = _i
    _BYTE_LUT[ord(_ch.lower())] = _i
_BYTE_LUT[ord("U")] = T
_BYTE_LUT[ord("u")] = T

# Complement in code space: A<->T, C<->G, R<->Y, M<->K, S<->S, W<->W,
# B<->V, D<->H, N<->N.
COMPLEMENT = np.array([T, G, C, A, 5, 4, 9, 7, 8, 6, 13, 12, 11, 10, 14],
                      dtype=np.uint8)

_CODE_TO_CHAR = np.frombuffer(_SYMBOLS.encode(), dtype=np.uint8)


def encode_sequence(seq: "str | bytes") -> np.ndarray:
    """Encode a nucleotide string into a uint8 code array."""
    if isinstance(seq, str):
        seq = seq.encode("ascii", errors="replace")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _BYTE_LUT[raw]


def decode_sequence(codes: np.ndarray) -> str:
    """Inverse of :func:`encode_sequence` (codes -> canonical upper-case)."""
    return _CODE_TO_CHAR[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def _open_maybe_gzip(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def iter_fasta(path: str) -> Iterator[Tuple[str, str]]:
    """Stream (name, sequence) records from a FASTA file (.gz ok)."""
    name = None
    chunks = []
    with _open_maybe_gzip(path) as fh:
        for line in fh:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, "".join(chunks)


def read_fasta_codes(path: str) -> Dict[str, np.ndarray]:
    """Read a FASTA file into {chrom: uint8 code array}."""
    return {name: encode_sequence(seq) for name, seq in iter_fasta(path)}


class Genome:
    """A reference genome held as per-chromosome uint8 code arrays.

    Replaces the reference's ``SeqIO.to_dict(SeqIO.parse(...))`` +
    Python-string slicing (``MuRaL/data/preprocessing.py:836``).
    """

    def __init__(self, chroms: Dict[str, np.ndarray]):
        self.chroms = chroms

    @classmethod
    def from_fasta(cls, path: str) -> "Genome":
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return cls(read_fasta_codes(path))

    def __contains__(self, chrom: str) -> bool:
        return chrom in self.chroms

    def __getitem__(self, chrom: str) -> np.ndarray:
        return self.chroms[chrom]

    def length(self, chrom: str) -> int:
        return len(self.chroms[chrom])

    def names(self):
        return list(self.chroms.keys())

    def window(self, chrom: str, start: int, stop: int,
               strand: str = "+") -> np.ndarray:
        """Extract codes for [start, stop); out-of-range positions are N.

        For '-' strand the window is reverse-complemented, matching the
        reference's strand handling (encode the reverse complement of the
        expanded window; ``preprocessing.py:697-700``).
        """
        codes = self.chroms[chrom]
        n = len(codes)
        lo, hi = max(start, 0), min(stop, n)
        out = np.full(stop - start, N_CODE, dtype=np.uint8)
        if hi > lo:
            out[lo - start:hi - start] = codes[lo:hi]
        if strand == "-":
            out = COMPLEMENT[out][::-1]
        return out
