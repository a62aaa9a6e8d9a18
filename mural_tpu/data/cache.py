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

``n_files > 1`` (the ``--n_h5_files`` flag) shards the per-site arrays
row-wise across N files written by N forked processes in parallel --
the TPU-native analogue of the reference's ExternalLink-stitched
multi-file H5 generation (ref data/preprocessing.py:319-353,
gen_distal_h5.py:179-217): gzip compression is the serial cost of the
cache write at 10^7-site scale, and it parallelizes embarrassingly
across shards.  The master file carries the shard manifest + global
attrs/segment offsets; loads stream the shards back on a thread pool.
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


_SITE_ARRAYS = ["chrom_id", "start", "stop", "strand_neg", "y",
                "local1", "cat"]
_ARRAYS = _SITE_ARRAYS + ["seg_offsets"]


def _shard_path(path: str, k: int, n: int) -> str:
    return f"{path}.part{k:02d}of{n:02d}"


def _write_shard(path: str, arrays: dict) -> None:
    """Write one row-shard (runs in a spawned worker process: JAX may be
    live and multi-threaded in the parent, so fork() is unsafe)."""
    import h5py
    n_rows = len(arrays[_SITE_ARRAYS[0]])
    with h5py.File(path + ".tmp", "w") as hf:
        hf.attrs["n_rows"] = n_rows
        for name, data in arrays.items():
            hf.create_dataset(name, data=data,
                              compression="gzip", compression_opts=1)
    os.replace(path + ".tmp", path)


def save_dataset_cache(ds, path: str, n_files: int = 1) -> None:
    """Write the cache; ``n_files > 1`` writes N row-shards in parallel
    spawned processes (gzip is the serial cost at scale and shards
    embarrassingly), then the stitching master (ref ExternalLink
    sharding, preprocessing.py:319-353).  The master is written LAST so
    its existence implies complete shards."""
    import h5py
    n_files = max(1, int(n_files))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if n_files > 1:
        from concurrent.futures import ProcessPoolExecutor
        import multiprocessing as mp
        bounds = np.linspace(0, ds.n_sites, n_files + 1).astype(np.int64)
        shards = [_shard_path(path, k, n_files) for k in range(n_files)]

        def slice_of(k):
            lo, hi = bounds[k], bounds[k + 1]
            arrays = {name: getattr(ds, name)[lo:hi]
                      for name in _SITE_ARRAYS}
            if ds.cont is not None:
                arrays["cont"] = ds.cont[lo:hi]
            return arrays

        from concurrent.futures.process import BrokenProcessPool
        try:
            with ProcessPoolExecutor(
                    max_workers=min(n_files, os.cpu_count() or 1),
                    mp_context=mp.get_context("spawn")) as pool:
                futs = [pool.submit(_write_shard, sp, slice_of(k))
                        for k, sp in enumerate(shards)]
                for f in futs:
                    f.result()  # re-raises a child's OSError as-is
        except (ValueError, BrokenProcessPool):
            # no spawn context / a worker died: the serial fallback
            # still surfaces real I/O errors
            for k, sp in enumerate(shards):
                _write_shard(sp, slice_of(k))
    with h5py.File(path + ".tmp", "w") as hf:
        hf.attrs["n_sites"] = ds.n_sites
        hf.attrs["model_type"] = ds.model_type
        hf.attrs["chrom_names"] = np.array(ds.chrom_names, dtype="S")
        hf.attrs["n_files"] = n_files
        if n_files > 1:
            hf.attrs["shard_rows"] = (bounds[1:] - bounds[:-1])
            hf.create_dataset("seg_offsets", data=ds.seg_offsets,
                              compression="gzip", compression_opts=1)
        else:
            for name in _ARRAYS:
                hf.create_dataset(name, data=getattr(ds, name),
                                  compression="gzip", compression_opts=1)
            if ds.cont is not None:
                hf.create_dataset("cont", data=ds.cont,
                                  compression="gzip", compression_opts=1)
    os.replace(path + ".tmp", path)


def _master_shards(hf, path: str):
    """Shard paths + row counts from a master file (empty for n=1)."""
    n_files = int(hf.attrs.get("n_files", 1))
    if n_files <= 1:
        return []
    rows = [int(r) for r in hf.attrs["shard_rows"]]
    return [(_shard_path(path, k, n_files), rows[k])
            for k in range(n_files)]


def is_cache_fresh(path: str, bed_file: str, n_sites_hint=None) -> bool:
    """mtime + sample-count staleness check (ref generate_h5fv2:322-346);
    sharded caches additionally verify every shard's existence, mtime
    and row count against the master manifest."""
    import h5py
    if not os.path.exists(path):
        return False
    try:
        bed_mtime = os.lstat(bed_file).st_mtime
        if bed_mtime >= os.lstat(path).st_mtime:
            return False
        with h5py.File(path, "r") as hf:
            if n_sites_hint is not None and \
                    hf.attrs["n_sites"] != n_sites_hint:
                return False
            shards = _master_shards(hf, path)
            if not shards:
                return all(name in hf for name in _ARRAYS)
            if "seg_offsets" not in hf:
                return False
        for sp, n_rows in shards:
            if not os.path.exists(sp) or \
                    bed_mtime >= os.lstat(sp).st_mtime:
                return False
            with h5py.File(sp, "r") as sf:
                if sf.attrs.get("n_rows") != n_rows or \
                        not all(name in sf for name in _SITE_ARRAYS):
                    return False
        return True
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
        shards = _master_shards(hf, path)
        if shards:
            arrays = {"seg_offsets": hf["seg_offsets"][:]}
            cont = None
        else:
            arrays = {name: hf[name][:] for name in _ARRAYS}
            cont = hf["cont"][:] if "cont" in hf else None
    if shards:
        from concurrent.futures import ThreadPoolExecutor

        def read_shard(sp):
            with h5py.File(sp, "r") as sf:
                return ({name: sf[name][:] for name in _SITE_ARRAYS},
                        sf["cont"][:] if "cont" in sf else None)

        with ThreadPoolExecutor(max_workers=min(8, len(shards))) as tp:
            parts = list(tp.map(read_shard, [sp for sp, _ in shards]))
        for name in _SITE_ARRAYS:
            arrays[name] = np.concatenate([p[0][name] for p in parts])
        if parts[0][1] is not None:
            cont = np.concatenate([p[1] for p in parts])
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
                           bw_distal: bool = False, n_files: int = 1):
    """prepare_dataset with a read-through cache (the --with_h5 path).

    ``n_files`` (--n_h5_files) shards the cache write across N parallel
    processes; a fresh cache is accepted regardless of its shard count
    (the master manifest is authoritative).

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
        save_dataset_cache(ds, path, n_files=n_files)
        printer(f"wrote site-encoding cache ({max(1, n_files)} "
                f"file(s)):", path)
    except OSError as e:
        printer("Warning: could not write cache:", e)
    return ds
