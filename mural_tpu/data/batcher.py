"""Segment-pool batching with XLA-static shapes.

Re-implements the reference's ``generate_data_batches`` re-batching scheme
(``MuRaL/data/preprocessing.py:1148-1226``): ``sampled_segments`` segments
are pooled, (optionally) shuffled, and re-cut into ``batch_size`` batches;
a short remainder is carried into the next pool, so all interior batches
are full.  Differences, deliberate for TPU/XLA:

- every emitted batch has a *static* shape of exactly ``batch_size`` rows;
  the final remainder of the epoch is either padded-and-masked
  (``pad_final=True``, used for validation/prediction so row order and
  coverage match the reference exactly) or dropped (training default;
  the reference itself skips size-1 remainders, training.py:415-416, and
  BatchNorm statistics must not see padding rows);
- batches carry an ``n_valid`` count; loss/metrics are mask-aware.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from mural_tpu.data.dataset import SiteDataset


@dataclass
class Batch:
    y: np.ndarray            # (B,) int32
    cat: np.ndarray          # (B, K) int32
    cont: Optional[np.ndarray]  # (B, n_cont) float32 or None
    distal: np.ndarray       # (B, W) uint8 genome codes
    n_valid: int
    rows: np.ndarray         # (B,) int64 dataset row ids (-1 for padding)
    distal_tracks: Optional[np.ndarray] = None  # (B, W, T) float32


def iter_batch_rows(ds: SiteDataset, sampled_segments: int,
                    batch_size: int, shuffle: bool = True,
                    rng: Optional[np.random.Generator] = None,
                    pad_final: bool = False):
    """Yield ``(rows, n_valid)`` pairs in segment-pool order.

    This is the row-order core of :func:`segment_pool_batches`, factored
    out so the device-resident training path (train/resident.py) consumes
    the *identical* permutation -- same ``rng`` draw sequence, same
    carry-over semantics -- and stays trajectory-equal to the host path.
    Padding rows (when ``pad_final``) are row id 0 with ``n_valid``
    marking the real prefix.
    """
    if rng is None:
        rng = np.random.default_rng()

    n_seg = ds.n_segments
    seg_order = np.arange(n_seg)
    if shuffle:
        rng.shuffle(seg_order)

    carry = np.empty(0, dtype=np.int64)

    for pool_start in range(0, n_seg, sampled_segments):
        segs = seg_order[pool_start:pool_start + sampled_segments]
        pool_rows = [ds.segment_rows(s) for s in segs]
        pool = np.concatenate([carry] + pool_rows) if len(pool_rows) else carry
        if shuffle:
            rng.shuffle(pool)
        n_full = len(pool) // batch_size
        for b in range(n_full):
            yield pool[b * batch_size:(b + 1) * batch_size], batch_size
        carry = pool[n_full * batch_size:]

    if len(carry) and pad_final:
        pad = np.zeros(batch_size - len(carry), dtype=np.int64)
        yield np.concatenate([carry, pad]), len(carry)
    # else: the epoch-end remainder is dropped (training path; the
    # reference itself skips size-1 remainders, training.py:415-416, and
    # BatchNorm statistics must not see padding rows)


def segment_pool_batches(ds: SiteDataset, sampled_segments: int,
                         batch_size: int, shuffle: bool = True,
                         rng: Optional[np.random.Generator] = None,
                         pad_final: bool = False) -> Iterator[Batch]:
    """Yield :class:`Batch` objects over the dataset.

    With ``shuffle=False`` the concatenated row order across batches is
    exactly the dataset's segment-emission order (carry-over rows are
    prepended to the next pool, preserving global order -- parity with the
    reference's validation/predict path).
    """

    def emit(rows: np.ndarray, n_valid: int) -> Batch:
        cont = None
        if ds.cont is not None:
            cont = ds.cont[rows]
            if n_valid < len(rows):
                cont = cont.copy()
                cont[n_valid:] = 0
        y = ds.y[rows].copy()
        cat = ds.cat[rows].copy()
        distal = ds.gather_distal(rows)
        dtr = (ds.gather_distal_track_values(rows)
               if ds.distal_tracks is not None else None)
        out_rows = rows.copy()
        if n_valid < len(rows):
            y[n_valid:] = 0
            cat[n_valid:] = 0
            distal[n_valid:] = 0
            if dtr is not None:
                dtr[n_valid:] = 0
            out_rows[n_valid:] = -1
        return Batch(y=y, cat=cat, cont=cont, distal=distal,
                     n_valid=n_valid, rows=out_rows, distal_tracks=dtr)

    for rows, n_valid in iter_batch_rows(ds, sampled_segments, batch_size,
                                         shuffle=shuffle, rng=rng,
                                         pad_final=pad_final):
        yield emit(rows, n_valid)

