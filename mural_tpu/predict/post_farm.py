"""Post-processing farm for genome-wide prediction output.

The reference's answer to genome-scale output is manual process farming:
"split the BED into ~1M-site files and run ~30 predict --cpu_only
processes" (MuRaL/commands/predict.py:135-138, docs/usage.rst:169-171).
Here the farming is built in, on the *post-processing* half only (the
device forward needs no farming -- it is async and fast):

- a chunk = (chrom, positions, strands, logits) is softmaxed, calibrated
  (Dirichlet predict_proba is pure numpy), optionally Poisson-calibrated,
  formatted to TSV bytes by the native C++ formatter, and gzip-compressed
  as an independent gzip *member* (concatenated members are a valid
  multi-member gzip stream -- every standard reader handles them);
- with ``n_workers > 0`` chunks fan out to spawned worker processes and a
  writer thread re-orders completed blobs by sequence number, so output
  is byte-identical to the serial path;
- with ``n_workers = 0`` everything runs inline (the right choice on a
  single-core host; the native formatter alone is ~12x the pandas path).

Workers never touch JAX devices: calibrator predict_proba is numpy
(mural_tpu/calibrate/multinomial.py:113-118).
"""

from __future__ import annotations

import pickle
import threading
import zlib
from typing import Optional

import numpy as np


def auto_n_workers(cores: Optional[int] = None) -> int:
    """Default worker count for the postprocess farm.

    Measured on a 1-core host, ``n_workers 2`` LOSES to inline (79k vs
    206k sites/s, round-4 STATUS.md): spawned workers contend with the
    main process's device-feed and drain threads for the same core and
    pay pickle+IPC for every chunk.  The farm only pays off when there
    are spare physical cores beyond the ~2 the main process keeps busy,
    so: inline on <=2 cores; otherwise leave 2 cores to the main
    process and cap at 6 (beyond that the single ordered writer thread
    is the bottleneck)."""
    if cores is None:
        import os
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:
            cores = os.cpu_count() or 1
    if cores <= 2:
        return 0
    return min(cores - 2, 6)


def postprocess_chunk(chrom: str, pos: np.ndarray, neg: np.ndarray,
                      logits: np.ndarray, calibrator, poisson: bool,
                      compresslevel: int = 0) -> tuple:
    """logits -> calibrated probs -> TSV bytes (optionally one gzip
    member).  Returns (n_rows, blob)."""
    from mural_tpu import native

    logits = np.asarray(logits, dtype=np.float64)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    if calibrator is not None:
        probs = calibrator.predict_proba(probs)
    if poisson:
        from mural_tpu.calibrate import poisson_calibrate
        probs = poisson_calibrate(probs)
    blob = native.format_pred_tsv(chrom, pos, neg, probs)
    if compresslevel:
        co = zlib.compressobj(compresslevel, zlib.DEFLATED, 31)
        blob = co.compress(blob) + co.flush()
    return len(pos), blob


def _worker(task_q, result_q, calib_blob: bytes, poisson: bool,
            compresslevel: int) -> None:
    calibrator = pickle.loads(calib_blob) if calib_blob else None
    while True:
        item = task_q.get()
        if item is None:
            return
        seq, chrom, pos, neg, logits = item
        try:
            n, blob = postprocess_chunk(chrom, pos, neg, logits,
                                        calibrator, poisson,
                                        compresslevel)
            result_q.put((seq, n, blob, None))
        except Exception as exc:  # surface in the main process
            result_q.put((seq, 0, b"", repr(exc)))


class PostprocessFarm:
    """Ordered calibrate+format+compress fan-out.

    ``submit`` is called with monotonically increasing chunks; ``close``
    flushes everything and returns the total row count.  Output bytes are
    identical for any ``n_workers`` (ordering is restored by sequence
    number before writing).
    """

    def __init__(self, out_path: str, header_cols, calibrator=None,
                 poisson: bool = False, n_workers: int = 0,
                 compresslevel: int = 1):
        self.gz = out_path.endswith(".gz")
        self.compresslevel = compresslevel if self.gz else 0
        self.calibrator = calibrator
        self.poisson = poisson
        self.n_workers = n_workers
        self.total = 0
        self._seq = 0
        self._error: Optional[str] = None
        self._fh = open(out_path, "wb")
        header = ("\t".join(header_cols) + "\n").encode()
        if self.gz:
            co = zlib.compressobj(self.compresslevel, zlib.DEFLATED, 31)
            self._fh.write(co.compress(header) + co.flush())
        else:
            self._fh.write(header)
        if n_workers > 0:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            self._task_q = ctx.Queue(maxsize=2 * n_workers)
            self._result_q = ctx.Queue()
            calib_blob = pickle.dumps(calibrator) if calibrator else b""
            self._procs = [
                ctx.Process(target=_worker,
                            args=(self._task_q, self._result_q,
                                  calib_blob, poisson, self.compresslevel),
                            daemon=True)
                for _ in range(n_workers)]
            for p in self._procs:
                p.start()
            self._done = 0
            self._buffer: dict = {}
            self._next_write = 0
            self._lock = threading.Condition()
            self._writer = threading.Thread(target=self._drain, daemon=True)
            self._writer.start()

    # -- worker-mode internals ------------------------------------------
    def _drain(self) -> None:
        """Writer thread: re-order completed chunks and append them."""
        while True:
            item = self._result_q.get()
            if item is None:
                return
            seq, n, blob, err = item
            with self._lock:
                if err and self._error is None:
                    self._error = err
                self._buffer[seq] = (n, blob)
                while self._next_write in self._buffer:
                    n2, b2 = self._buffer.pop(self._next_write)
                    self._fh.write(b2)
                    self.total += n2
                    self._next_write += 1
                self._done += 1
                self._lock.notify_all()

    # -- public API ------------------------------------------------------
    def submit(self, chrom: str, pos: np.ndarray, neg: np.ndarray,
               logits: np.ndarray) -> None:
        if self._error:
            raise RuntimeError(f"postprocess worker failed: {self._error}")
        if self.n_workers == 0:
            n, blob = postprocess_chunk(chrom, pos, neg, logits,
                                        self.calibrator, self.poisson,
                                        self.compresslevel)
            self._fh.write(blob)
            self.total += n
        else:
            import queue as _queue
            item = (self._seq, chrom, np.ascontiguousarray(pos),
                    np.ascontiguousarray(neg), np.asarray(logits))
            while True:
                try:
                    self._task_q.put(item, timeout=5.0)
                    break
                except _queue.Full:
                    # a worker killed by the OS (OOM, segfault) never
                    # drains the bounded queue -- fail instead of
                    # blocking a multi-hour run forever
                    if not all(p.is_alive() for p in self._procs):
                        raise RuntimeError(
                            "postprocess worker process died; see any "
                            "earlier error, or check host memory")
        self._seq += 1

    def close(self) -> int:
        if self.n_workers > 0:
            with self._lock:
                # bounded waits + liveness checks: a worker that dies
                # without posting its result would otherwise leave
                # _done < _seq forever (deadlocked close at the end of
                # a multi-hour genome-wide run)
                while not (self._done >= self._seq
                           or self._error is not None):
                    self._lock.wait(timeout=5.0)
                    if (self._done < self._seq and self._error is None
                            and not all(p.is_alive()
                                        for p in self._procs)):
                        # grace period: peers' queued results drain via
                        # the writer thread before we give up
                        self._lock.wait(timeout=5.0)
                        if self._done < self._seq:
                            self._error = ("worker process died without "
                                           "posting a result")
            for _ in self._procs:
                self._task_q.put(None)
            self._result_q.put(None)
            self._writer.join()
            for p in self._procs:
                p.join(timeout=30)
            if self._error:
                self._fh.close()
                raise RuntimeError(
                    f"postprocess worker failed: {self._error}")
        self._fh.close()
        return self.total
