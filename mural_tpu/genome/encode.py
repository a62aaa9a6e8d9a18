"""Vectorized sequence encodings from uint8 genome codes.

All encoders are semantics-parity re-implementations of the reference's
per-character Python loops (``MuRaL/data/preprocessing.py``):

- fractional IUPAC one-hot table        (ref ``seq_ohe_encoder`` :756-816)
- digit encoding with -1 for ambiguity  (ref ``seq_digit_encoder`` :636-723)
- radix k-mer packing with 4**k padding id (ref :702-722)
- SNV/INDEL window-coordinate conventions  (ref ``extend_interval`` :559-567)

but operate on whole batches of sites with numpy gathers; the one-hot
expansion itself is deferred to the device (see
:func:`mural_tpu.models.layers.one_hot_from_codes`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mural_tpu.genome.fasta import COMPLEMENT, N_CODE, NUM_CODES

# --- tables -----------------------------------------------------------------

# Fractional one-hot rows per IUPAC code, identical values to the reference
# table at preprocessing.py:758-772 (A,C,G,T axes).
ONE_HOT_TABLE = np.array(
    [
        [1, 0, 0, 0],          # A
        [0, 1, 0, 0],          # C
        [0, 0, 1, 0],          # G
        [0, 0, 0, 1],          # T
        [0.5, 0, 0.5, 0],      # R = A/G
        [0, 0.5, 0, 0.5],      # Y = C/T
        [0.5, 0.5, 0, 0],      # M = A/C
        [0, 0.5, 0.5, 0],      # S = C/G
        [0.5, 0, 0, 0.5],      # W = A/T
        [0, 0, 0.5, 0.5],      # K = G/T
        [0, 1 / 3, 1 / 3, 1 / 3],  # B = not A
        [1 / 3, 0, 1 / 3, 1 / 3],  # D = not C
        [1 / 3, 1 / 3, 0, 1 / 3],  # H = not G
        [1 / 3, 1 / 3, 1 / 3, 0],  # V = not T
        [0.25, 0.25, 0.25, 0.25],  # N
    ],
    dtype=np.float32,
)
assert ONE_HOT_TABLE.shape == (NUM_CODES, 4)

# code -> digit (A/C/G/T -> 0..3, ambiguity codes -> -1), ref :655-666.
DIGIT_TABLE = np.concatenate(
    [np.arange(4, dtype=np.int8), np.full(NUM_CODES - 4, -1, dtype=np.int8)]
)


def expanded_start(start: np.ndarray, radius: int,
                   model_type: str = "snv") -> np.ndarray:
    """Left edge of the radius-expanded window around a BED interval.

    SNV: window [start - r, start + r + 1) of length 2r+1 anchored on the
    base at `start`.  INDEL: window [start - r + 1, stop + r) of length 2r
    anchored on the gap (ref ``extend_interval`` preprocessing.py:559-567
    with stop == start + 1 for single-base BED rows).
    """
    start = np.asarray(start, dtype=np.int64)
    if model_type == "snv":
        return start - radius
    return start - radius + 1


def window_size(radius: int, local_order: int = 1,
                model_type: str = "snv") -> int:
    """Number of encoded columns in a window (ref ``calc_window_size``)."""
    base = 2 * radius + (1 if model_type == "snv" else 0)
    return base - (local_order - 1)


# --- batched window gathers -------------------------------------------------

def gather_windows(codes: np.ndarray, starts: np.ndarray, width: int,
                   neg_strand: np.ndarray) -> np.ndarray:
    """Gather (N, width) uint8 code windows from one chromosome.

    ``starts`` are forward-strand start coordinates (may be negative or run
    past the chromosome end; those positions become N).  Rows flagged in
    ``neg_strand`` are reverse-complemented, which is exactly equivalent to
    the reference's encode-reverse-complement-then-slice-from-the-end
    scheme (preprocessing.py:697-720) -- see tests/test_encode.py.
    """
    starts = np.asarray(starts, dtype=np.int64)
    n = len(codes)
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    in_range = (idx >= 0) & (idx < n)
    out = np.where(in_range, codes[np.clip(idx, 0, max(n - 1, 0))], N_CODE)
    out = out.astype(np.uint8, copy=False)
    neg_strand = np.asarray(neg_strand, dtype=bool)
    if neg_strand.any():
        rc = COMPLEMENT[out[neg_strand]][:, ::-1]
        out[neg_strand] = rc
    return out


def digits_from_codes(windows: np.ndarray) -> np.ndarray:
    """uint8 code windows -> int8 digits (ambiguity -> -1)."""
    return DIGIT_TABLE[windows]


def kmer_ids(windows: np.ndarray, k: int) -> np.ndarray:
    """Pack overlapping k-mers into radix-4 ids.

    Output shape (N, W - k + 1), dtype int32.  Any k-mer containing an
    ambiguous base gets the padding id ``4**k`` (ref preprocessing.py:
    702-722).  For k == 1 ambiguous bases become 0 only via the caller's
    outlier handling; here they stay -1 (ref applies np.where separately).
    """
    digits = DIGIT_TABLE[windows].astype(np.int32)
    n, w = digits.shape
    if k == 1:
        return digits
    cols = w - k + 1
    ids = np.zeros((n, cols), dtype=np.int32)
    bad = np.zeros((n, cols), dtype=bool)
    for d in range(k):
        sl = digits[:, d:d + cols]
        ids = ids * 4 + np.where(sl < 0, 0, sl)
        bad |= sl < 0
    ids[bad] = 4 ** k
    return ids


def order1_local(windows: np.ndarray, model_type: str = "snv") -> np.ndarray:
    """Order-1 local columns with the reference's outlier handling.

    Ambiguity digits (-1) are clamped to 0 (ref ``process_local_seq_snv`` /
    ``_indel``, preprocessing.py:479-490).  Returns int8 (N, 2r+1|2r).
    """
    d = DIGIT_TABLE[windows]
    return np.where(d >= 0, d, 0).astype(np.int8)


def check_snv_mid_base(windows: np.ndarray, radius: int) -> None:
    """Reference parity check: all focal (mid) bases in a segment must be
    identical, else the BED/genome pairing is wrong (preprocessing.py:
    482-484).  Raises ValueError instead of sys.exit."""
    mid = DIGIT_TABLE[windows[:, radius]]
    if len(mid) and np.unique(mid).shape[0] != 1:
        raise ValueError(
            "The positions in the input BED file have different bases "
            "(A/T and C/G mixed)! The ref_genome or input BED file could "
            "be wrong."
        )


def local_headers(local_radius: int, local_order: int,
                  model_type: str) -> list:
    """Column names for local features (ref ``get_local_header``)."""
    if local_order == 1:
        ups = [f"us{local_radius - i}" for i in range(local_radius)]
        dns = [f"ds{i + 1}" for i in range(local_radius)]
        if model_type == "snv":
            return ups + ["mid"] + dns
        return ups + dns
    n = window_size(local_radius, local_order, model_type)
    return [f"cat{i + 1}" for i in range(n)]
