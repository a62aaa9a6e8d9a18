"""Native C++ encoder parity vs the numpy reference implementations."""
import numpy as np
import pytest

from mural_tpu import native
from mural_tpu.genome import encode as enc


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native encoder unavailable (no g++?)")
    return True


def test_gather_windows_parity(lib_ok):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 15, size=10_000).astype(np.uint8)
    starts = rng.integers(-50, 10_050, size=500)
    neg = rng.integers(0, 2, size=500).astype(bool)
    for width in (21, 401, 128):
        ref = enc.gather_windows(codes, starts, width, neg)
        got = native.gather_windows(codes, starts, width, neg)
        assert np.array_equal(ref, got)


def test_gather_windows_degenerate(lib_ok):
    codes = np.arange(4, dtype=np.uint8)
    # entirely out of range both sides
    got = native.gather_windows(codes, np.array([-100, 100]), 5,
                                np.array([False, True]))
    ref = enc.gather_windows(codes, np.array([-100, 100]), 5,
                             np.array([False, True]))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("k", [2, 3, 5, 7])
def test_kmer_pack_parity(lib_ok, k):
    rng = np.random.default_rng(k)
    windows = rng.integers(0, 15, size=(200, 31)).astype(np.uint8)
    ref = enc.kmer_ids(windows, k)
    got = native.kmer_pack(windows, k)
    assert np.array_equal(ref, got)


def test_native_speedup_on_large_gather(lib_ok):
    """The native path must not be slower than numpy on the genome-scale
    shape (8000-wide INDEL windows)."""
    import time
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, size=2_000_000).astype(np.uint8)
    starts = rng.integers(0, 1_990_000, size=2000)
    neg = np.zeros(2000, bool)
    t0 = time.time()
    a = enc.gather_windows(codes, starts, 8000, neg)
    t_np = time.time() - t0
    t0 = time.time()
    b = native.gather_windows(codes, starts, 8000, neg)
    t_cc = time.time() - t0
    assert np.array_equal(a, b)
    assert t_cc < t_np * 1.5, (t_cc, t_np)
