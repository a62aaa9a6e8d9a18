"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is first imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU backend regardless of the
# JAX_PLATFORMS env var; the config update below reliably pins tests to the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated suite runs skip CPU XLA compiles
_cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def tiny_genome(rng, tmp_path_factory):
    """A small synthetic genome (2 chroms) written as FASTA.

    chrM is tiny to exercise edge imputation.
    """
    from mural_tpu.genome.fasta import decode_sequence

    base = tmp_path_factory.mktemp("genome")
    lengths = {"chr1": 200_000, "chrM": 600}
    path = base / "seq.fa"
    seqs = {}
    with open(path, "w") as fh:
        for name, n in lengths.items():
            codes = rng.integers(0, 4, size=n).astype(np.uint8)
            # sprinkle ambiguity codes
            amb = rng.integers(0, n, size=n // 200)
            codes[amb] = rng.integers(4, 15, size=len(amb)).astype(np.uint8)
            seq = decode_sequence(codes)
            seqs[name] = seq
            fh.write(f">{name}\n")
            for i in range(0, n, 70):
                fh.write(seq[i:i + 70] + "\n")
    return {"path": str(path), "seqs": seqs}


def make_bed(path, genome_seqs, rng, n_sites=400, n_class=4,
             snv_mid_base="A", chroms=("chr1", "chrM")):
    """Write a sorted 6-column BED whose '+' sites sit on `snv_mid_base`
    and '-' sites on its complement (the reference requires a uniform
    focal base per strand, preprocessing.py:482-484)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rows = []
    for chrom in chroms:
        seq = genome_seqs[chrom]
        pos_plus = [i for i, ch in enumerate(seq) if ch == snv_mid_base]
        pos_minus = [i for i, ch in enumerate(seq) if ch == comp[snv_mid_base]]
        take = min(n_sites // len(chroms) // 2, len(pos_plus), len(pos_minus))
        sel_p = sorted(rng.choice(len(pos_plus), size=take, replace=False))
        sel_m = sorted(rng.choice(len(pos_minus), size=take, replace=False))
        for i in sel_p:
            p = pos_plus[i]
            rows.append((chrom, p, p + 1, ".", int(rng.integers(0, n_class)), "+"))
        for i in sel_m:
            p = pos_minus[i]
            rows.append((chrom, p, p + 1, ".", int(rng.integers(0, n_class)), "-"))
    rows.sort(key=lambda r: (r[0], r[1]))
    with open(path, "w") as fh:
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    return path


@pytest.fixture(scope="session")
def tiny_bed(tiny_genome, rng, tmp_path_factory):
    base = tmp_path_factory.mktemp("bed")
    path = base / "sites.sorted.bed"
    make_bed(path, tiny_genome["seqs"], rng)
    return str(path)
