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
