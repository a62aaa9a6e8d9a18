"""On-disk dataset cache (the reference's H5 pipeline, re-thought).

The reference pre-encodes distal one-hot arrays into gzip'd HDF5 with a
content-addressed name and mtime+sample-count staleness checks
(``get_h5f_path`` / ``generate_h5fv2``, MuRaL/data/preprocessing.py:
191-353), because its Python per-character encoding was slow enough to be
worth caching.  Our uint8-code gathers are faster than HDF5 reads, so
distal windows are never cached; what IS worth caching across runs are
the parsed-BED site table and local k-mer features.  ``--with_h5`` maps
to this cache.

Format: one HDF5 file next to the BED (or under ``h5f_path``) holding the
SiteDataset per-site arrays + segment offsets; staleness = BED mtime +
site count + encoding parameters, mirroring the reference's check.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _track_fingerprint(tracks, seq_only: bool) -> str:
    """Continuous-feature configuration fingerprint: the cache must not
    be shared across runs with different tracks or seq_only settings, and
    must go stale when a track file changes (mirrors the reference's
    bw-name-suffixed H5 names + mtime check, preprocessing.py:191-204,
    322-346)."""
    import hashlib
    parts = [f"seq_only={bool(seq_only)}"]
    if tracks is not None and len(tracks) > 0:
        for name, radius, tr in zip(tracks.names, tracks.radii,
                                    getattr(tracks, "files",
                                            [None] * len(tracks.names))):
            parts.append(f"{name}:{radius}:{tr}")
        for f in getattr(tracks, "files", []):
            try:
                parts.append(str(os.lstat(f).st_mtime))
            except OSError:
                parts.append("?")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def cache_path(bed_file: str, central_bp: int, local_radius: int,
               local_order: int, distal_radius: int, model_type: str,
               cache_dir: Optional[str] = None, tracks=None,
               seq_only: bool = False) -> str:
    """Content-addressed cache name (ref ``get_h5f_path``:191-204)."""
    name = (f"{os.path.basename(bed_file)}.local_{local_radius}_"
            f"{local_order}.distal_{distal_radius}.segment_{central_bp}"
            f".{model_type}.{_track_fingerprint(tracks, seq_only)}"
            f".sites.h5")
    base = cache_dir or os.path.dirname(os.path.abspath(bed_file))
    return os.path.join(base, name)


_ARRAYS = ["chrom_id", "start", "stop", "strand_neg", "y", "local1",
           "cat", "seg_offsets"]


def save_dataset_cache(ds, path: str) -> None:
    import h5py
    with h5py.File(path + ".tmp", "w") as hf:
        hf.attrs["n_sites"] = ds.n_sites
        hf.attrs["model_type"] = ds.model_type
        hf.attrs["chrom_names"] = np.array(ds.chrom_names, dtype="S")
        for name in _ARRAYS:
            hf.create_dataset(name, data=getattr(ds, name),
                              compression="gzip", compression_opts=1)
        if ds.cont is not None:
            hf.create_dataset("cont", data=ds.cont, compression="gzip",
                              compression_opts=1)
    os.replace(path + ".tmp", path)


def is_cache_fresh(path: str, bed_file: str, n_sites_hint=None) -> bool:
    """mtime + sample-count staleness check (ref generate_h5fv2:322-346)."""
    import h5py
    if not os.path.exists(path):
        return False
    try:
        if os.lstat(bed_file).st_mtime >= os.lstat(path).st_mtime:
            return False
        with h5py.File(path, "r") as hf:
            if n_sites_hint is not None and \
                    hf.attrs["n_sites"] != n_sites_hint:
                return False
            return all(name in hf for name in _ARRAYS)
    except OSError:
        return False


def load_dataset_cache(path: str, genome, central_bp: int,
                       local_radius: int, local_order: int,
                       distal_radius: int):
    import h5py

    from mural_tpu.data.dataset import SiteDataset
    with h5py.File(path, "r") as hf:
        model_type = hf.attrs["model_type"]
        if hasattr(model_type, "decode"):
            model_type = model_type.decode()
        chrom_names = [c.decode() for c in hf.attrs["chrom_names"]]
        arrays = {name: hf[name][:] for name in _ARRAYS}
        cont = hf["cont"][:] if "cont" in hf else None
    return SiteDataset(
        model_type=str(model_type),
        local_radius=local_radius,
        local_order=local_order,
        distal_radius=distal_radius,
        central_bp=central_bp,
        chrom_names=chrom_names,
        chrom_codes=[genome[c] for c in chrom_names],
        chrom_id=arrays["chrom_id"],
        start=arrays["start"],
        stop=arrays["stop"],
        strand_neg=arrays["strand_neg"].astype(bool),
        y=arrays["y"],
        local1=arrays["local1"],
        cat=arrays["cat"],
        cont=cont,
        seg_offsets=arrays["seg_offsets"],
    )


def prepare_dataset_cached(bed_file: str, genome, central_bp: int,
                           local_radius: int, local_order: int,
                           distal_radius: int, model_type: str,
                           cache_dir: Optional[str] = None, tracks=None,
                           seq_only: bool = False, printer=print,
                           bw_distal: bool = False):
    """prepare_dataset with a read-through cache (the --with_h5 path).

    Per-base distal track values are never cached (they are gathered
    on demand per batch); the cache only has to re-attach the TrackSet
    handle on load."""
    from mural_tpu.data.dataset import prepare_dataset
    from mural_tpu.genome.fasta import Genome
    if isinstance(genome, str):
        genome = Genome.from_fasta(genome)
    path = cache_path(bed_file, central_bp, local_radius, local_order,
                      distal_radius, model_type, cache_dir,
                      tracks=tracks, seq_only=seq_only)
    if is_cache_fresh(path, bed_file):
        printer("using cached site encodings:", path)
        ds = load_dataset_cache(path, genome, central_bp, local_radius,
                                local_order, distal_radius)
        if bw_distal and tracks is not None and len(tracks) > 0:
            ds.distal_tracks = tracks
        return ds
    ds = prepare_dataset(bed_file, genome, central_bp=central_bp,
                         local_radius=local_radius,
                         local_order=local_order,
                         distal_radius=distal_radius,
                         model_type=model_type, tracks=tracks,
                         seq_only=seq_only, bw_distal=bw_distal)
    try:
        save_dataset_cache(ds, path)
        printer("wrote site-encoding cache:", path)
    except OSError as e:
        printer("Warning: could not write cache:", e)
    return ds
