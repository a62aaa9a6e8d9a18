"""ctypes bindings for the native encoder (built on demand with g++).

Falls back transparently to the numpy implementations in
:mod:`mural_tpu.genome.encode` when no compiler is available; callers use
:func:`gather_windows` / :func:`kmer_pack` without caring which backend
serves them.  Set ``MURAL_TPU_NO_NATIVE=1`` to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "encoder.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libmural_encoder.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-fno-math-errno", _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MURAL_TPU_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.mural_gather_windows.argtypes = [
            u8p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            u8p, u8p, ctypes.c_uint8, u8p]
        lib.mural_kmer_pack.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i8p,
            ctypes.c_int32, i32p]
        lib.mural_encode_bytes.argtypes = [
            u8p, ctypes.c_int64, u8p, u8p]
        lib.mural_gather_one_hot.argtypes = [
            u8p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            u8p, u8p, ctypes.c_uint8, f32p, f32p]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mural_track_mean.argtypes = [
            f64p, f32p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, f64p]
        lib.mural_format_pred_tsv.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, i64p, u8p, f64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64]
        lib.mural_format_pred_tsv.restype = ctypes.c_int64
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def gather_windows(codes: np.ndarray, starts: np.ndarray, width: int,
                   neg_strand: np.ndarray) -> np.ndarray:
    """Native (or numpy-fallback) window gather; same contract as
    :func:`mural_tpu.genome.encode.gather_windows`."""
    from mural_tpu.genome import encode as enc
    from mural_tpu.genome.fasta import COMPLEMENT, N_CODE
    lib = get_lib()
    if lib is None:
        return enc.gather_windows(codes, starts, width, neg_strand)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    neg = np.ascontiguousarray(neg_strand, dtype=np.uint8)
    out = np.empty((len(starts), width), dtype=np.uint8)
    lib.mural_gather_windows(
        np.ascontiguousarray(codes), len(codes), starts, len(starts),
        width, neg, COMPLEMENT, N_CODE, out)
    return out


def track_mean(block_prefix: np.ndarray, inblock: np.ndarray,
               starts: np.ndarray, stops: np.ndarray, k: int = 4096):
    """One-pass range means over a two-level prefix-sum track; returns
    None when the native library is unavailable (caller falls back to
    the vectorized numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(inblock)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    stops = np.ascontiguousarray(stops, dtype=np.int64)
    out = np.empty(len(starts), dtype=np.float64)
    lib.mural_track_mean(
        np.ascontiguousarray(block_prefix, dtype=np.float64),
        np.ascontiguousarray(inblock, dtype=np.float32),
        n, k, starts, stops, len(starts), out)
    return out


def format_pred_tsv(chrom: str, pos: np.ndarray, neg: np.ndarray,
                    probs: np.ndarray) -> bytes:
    """Format prediction rows as TSV bytes (chrom start end strand
    mut_type prob0..N, probabilities %.4g — the reference's to_csv
    float_format).  mut_type is the constant 0: genome-wide sites carry
    no observation, and the documented schema requires the column so
    `evaluate` accepts the output.  Native C++ when available, numpy
    fallback otherwise."""
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    neg = np.ascontiguousarray(neg, dtype=np.uint8)
    probs = np.ascontiguousarray(probs, dtype=np.float64)
    n, n_class = probs.shape
    lib = get_lib()
    if lib is not None and n:
        cb = chrom.encode()
        cap = n * (len(cb) + 2 * 21 + 2 + 2 + n_class * 14 + 8)
        buf = ctypes.create_string_buffer(cap)
        written = lib.mural_format_pred_tsv(cb, len(cb), pos, neg, probs,
                                            n, n_class, buf, cap)
        if written >= 0:
            return buf.raw[:written]
    # numpy fallback: vectorized %-formatting per column
    cols = [np.full(n, chrom), pos.astype(str),
            (pos + 1).astype(str), np.where(neg, "-", "+"),
            np.full(n, "0")]
    cols += [np.char.mod("%.4g", probs[:, j]) for j in range(n_class)]
    rows = cols[0]
    for c in cols[1:]:
        rows = np.char.add(np.char.add(rows, "\t"), c)
    return ("\n".join(rows) + "\n").encode() if n else b""


def kmer_pack(windows: np.ndarray, k: int) -> np.ndarray:
    from mural_tpu.genome import encode as enc
    lib = get_lib()
    if lib is None:
        return enc.kmer_ids(windows, k)
    if k == 1:
        return enc.kmer_ids(windows, k)
    windows = np.ascontiguousarray(windows, dtype=np.uint8)
    n, w = windows.shape
    out = np.empty((n, w - k + 1), dtype=np.int32)
    lib.mural_kmer_pack(windows, n, w, k,
                        np.ascontiguousarray(enc.DIGIT_TABLE), 4 ** k, out)
    return out
