"""Site dataset construction: local features + distal gather metadata.

Equivalent of the reference's ``prepare_dataset_np`` + ``CombinedDatasetNP``
(``MuRaL/data/preprocessing.py:828-954``) with a TPU-first layout:

- all sites are re-ordered into *segment emission order* once, so every
  segment is a contiguous row range (arrays `seg_offsets` / `seg_sizes`);
- local order-1 digits and order-k k-mer ids are computed vectorized per
  chromosome (no per-character Python loops);
- distal windows are NOT materialised: each site stores its expanded
  window start, chromosome id and strand, and batches gather uint8 code
  windows on demand (`gather_distal`), one-hot happening on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.bed import BedFile, segment_sites
from mural_tpu.genome.fasta import Genome


@dataclass
class SiteDataset:
    """All per-site arrays live in segment emission order."""

    model_type: str                 # 'snv' | 'indel'
    local_radius: int
    local_order: int
    distal_radius: int
    central_bp: int

    # genome handles for distal gathers
    chrom_names: List[str]
    chrom_codes: List[np.ndarray]

    # per-site arrays (length n_sites, segment emission order)
    chrom_id: np.ndarray            # int32
    start: np.ndarray               # int64 (BED start)
    stop: np.ndarray                # int64 (BED stop)
    strand_neg: np.ndarray          # bool
    y: np.ndarray                   # int32 labels
    local1: np.ndarray              # int8  (n, 2r+1|2r) order-1 digits
    cat: np.ndarray                 # int32 (n, n_cat) model categorical ids
    cont: Optional[np.ndarray]      # float32 (n, n_cont) or None

    # segment structure
    seg_offsets: np.ndarray         # int64 (n_segments + 1,)

    # per-base distal track channels (the capability the reference's
    # training.py:258-260 promises -- in_channels = 4**distal_order +
    # n_cont -- but its NP pipeline never delivers, PARITY.md): a
    # TrackSet whose per-base values are appended to the one-hot window
    # as extra channels on device
    distal_tracks: Optional[object] = None

    extras: Dict = field(default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def n_sites(self) -> int:
        return len(self.start)

    @property
    def n_segments(self) -> int:
        return len(self.seg_offsets) - 1

    @property
    def n_cont(self) -> int:
        return 0 if self.cont is None else self.cont.shape[1]

    @property
    def cat_dims(self) -> List[int]:
        """Max id + 1 per categorical column (ref CombinedDatasetNP:891)."""
        return [int(self.cat[:, j].max()) + 1 for j in range(self.cat.shape[1])]

    @property
    def emb_padding_idx(self) -> int:
        return 4 ** self.local_order

    @property
    def distal_width(self) -> int:
        return enc.window_size(self.distal_radius, 1, self.model_type)

    @property
    def n_distal_tracks(self) -> int:
        return 0 if self.distal_tracks is None else len(self.distal_tracks)

    def segment_rows(self, seg: int) -> np.ndarray:
        return np.arange(self.seg_offsets[seg], self.seg_offsets[seg + 1])

    # ------------------------------------------------------------------
    def gather_distal(self, rows: np.ndarray) -> np.ndarray:
        """uint8 code windows (len(rows), distal_width) for given site rows.

        Uses the native C++ gather when available (built on demand,
        mural_tpu/native/encoder.cpp), falling back to numpy."""
        from mural_tpu import native
        rows = np.asarray(rows)
        width = self.distal_width
        out = np.empty((len(rows), width), dtype=np.uint8)
        starts = enc.expanded_start(self.start[rows], self.distal_radius,
                                    self.model_type)
        cids = self.chrom_id[rows]
        neg = self.strand_neg[rows]
        for cid in np.unique(cids):
            m = cids == cid
            out[m] = native.gather_windows(self.chrom_codes[cid],
                                           starts[m], width, neg[m])
        return out

    def gather_distal_track_values(self, rows: np.ndarray) -> np.ndarray:
        """(len(rows), distal_width, n_distal_tracks) float32 per-base
        track values over the distal windows; reverse-strand rows come
        back reversed so they stay aligned with the reverse-complemented
        one-hot (genome/tracks.py window_values)."""
        rows = np.asarray(rows)
        width = self.distal_width
        out = np.empty((len(rows), width, self.n_distal_tracks),
                       dtype=np.float32)
        starts = enc.expanded_start(self.start[rows], self.distal_radius,
                                    self.model_type)
        cids = self.chrom_id[rows]
        neg = self.strand_neg[rows]
        for cid in np.unique(cids):
            m = cids == cid
            out[m] = self.distal_tracks.distal_windows(
                self.chrom_names[cid], starts[m], width, neg[m])
        return out

    def local_frame(self):
        """pandas DataFrame of order-1 columns + mut_type, for evaluation
        (mirrors the reference's ``data_local``)."""
        import pandas as pd
        cols = enc.local_headers(self.local_radius, 1, self.model_type)
        df = pd.DataFrame(self.local1, columns=cols)
        df["mut_type"] = self.y
        return df

    def position_frame(self):
        """chrom/start/end/strand frame in emission order
        (ref ``get_position_info``)."""
        import pandas as pd
        return pd.DataFrame({
            "chrom": [self.chrom_names[i] for i in self.chrom_id],
            "start": self.start,
            "end": self.stop,
            "strand": np.where(self.strand_neg, "-", "+"),
        })

    def subset_segments(self, seg_ids: np.ndarray) -> "SiteDataset":
        """New dataset restricted to the given segments (sorted order).

        Used by the split-by-segment train/validation split
        (ref training.py:220-229)."""
        seg_ids = np.sort(np.asarray(seg_ids))
        rows = np.concatenate(
            [self.segment_rows(s) for s in seg_ids]) if len(seg_ids) else \
            np.empty(0, dtype=np.int64)
        sizes = [self.seg_offsets[s + 1] - self.seg_offsets[s]
                 for s in seg_ids]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        return SiteDataset(
            model_type=self.model_type,
            local_radius=self.local_radius,
            local_order=self.local_order,
            distal_radius=self.distal_radius,
            central_bp=self.central_bp,
            chrom_names=self.chrom_names,
            chrom_codes=self.chrom_codes,
            chrom_id=self.chrom_id[rows],
            start=self.start[rows],
            stop=self.stop[rows],
            strand_neg=self.strand_neg[rows],
            y=self.y[rows],
            local1=self.local1[rows],
            cat=self.cat[rows],
            cont=None if self.cont is None else self.cont[rows],
            seg_offsets=offsets,
            distal_tracks=self.distal_tracks,
        )


def prepare_dataset(bed: "BedFile | str", genome: "Genome | str",
                    central_bp: int = 300000, local_radius: int = 7,
                    local_order: int = 3, distal_radius: int = 200,
                    distal_order: int = 1, model_type: str = "snv",
                    tracks=None, seq_only: bool = False,
                    check_mid: bool = True,
                    bw_distal: bool = False) -> SiteDataset:
    """Build a :class:`SiteDataset` (ref ``prepare_dataset_np``).

    ``tracks`` is an optional :class:`mural_tpu.genome.tracks.TrackSet`
    supplying continuous local features (the reference's mean-bigWig
    columns, preprocessing.py:725-750).  With ``bw_distal`` the same
    tracks additionally provide per-base distal channels
    (in_channels = 4**distal_order + n_cont, training.py:258-260 --
    working here, unlike the reference).
    """
    if isinstance(bed, str):
        bed = BedFile.read(bed)
    if isinstance(genome, str):
        genome = Genome.from_fasta(genome)
    if distal_order != 1:
        raise NotImplementedError(
            "distal_order > 1 is reserved in the reference too "
            "(run_predict.py:73)")

    segments = segment_sites(bed, central_bp)
    perm = (np.concatenate(segments) if segments
            else np.empty(0, dtype=np.int64))
    sizes = np.asarray([len(s) for s in segments], dtype=np.int64)
    seg_offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    chrom_names = genome.names()
    name_to_id = {c: i for i, c in enumerate(chrom_names)}
    try:
        chrom_id = np.asarray([name_to_id[bed.chrom[i]] for i in perm],
                              dtype=np.int32)
    except KeyError as e:
        raise KeyError(f"BED chromosome {e} not found in reference genome")
    start = bed.start[perm]
    stop = bed.stop[perm]
    strand_neg = bed.strand[perm]
    y = bed.label[perm]

    chrom_codes = [genome[c] for c in chrom_names]

    # --- local encodings, vectorized per chromosome -------------------
    lw = enc.window_size(local_radius, 1, model_type)
    local_starts = enc.expanded_start(start, local_radius, model_type)
    local_windows = np.empty((len(perm), lw), dtype=np.uint8)
    for cid in np.unique(chrom_id) if len(perm) else []:
        m = chrom_id == cid
        local_windows[m] = enc.gather_windows(
            chrom_codes[cid], local_starts[m], lw, strand_neg[m])

    if model_type == "snv" and check_mid and len(perm):
        for s in range(len(segments)):
            rows = slice(seg_offsets[s], seg_offsets[s + 1])
            enc.check_snv_mid_base(local_windows[rows], local_radius)

    local1 = enc.order1_local(local_windows, model_type)

    if local_order > 1:
        from mural_tpu import native
        cat = native.kmer_pack(local_windows, local_order)
    else:
        cat = local1.astype(np.int32)

    # --- continuous local features ------------------------------------
    cont = None
    if tracks is not None and not seq_only and len(tracks) > 0:
        cont = tracks.mean_over_sites(
            [bed.chrom[i] for i in perm], start, stop,
            model_type=model_type).astype(np.float32)

    return SiteDataset(
        model_type=model_type,
        local_radius=local_radius,
        local_order=local_order,
        distal_radius=distal_radius,
        central_bp=central_bp,
        chrom_names=chrom_names,
        chrom_codes=chrom_codes,
        chrom_id=chrom_id,
        start=start,
        stop=stop,
        strand_neg=strand_neg,
        y=y.astype(np.int32),
        local1=local1,
        cat=cat.astype(np.int32),
        cont=cont,
        seg_offsets=seg_offsets,
        distal_tracks=(tracks if (bw_distal and tracks is not None
                                  and not seq_only and len(tracks) > 0)
                       else None),
    )
