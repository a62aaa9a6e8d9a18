"""Double-buffered host->device prefetch.

The reference overlaps host encoding with GPU compute via DataLoader worker
processes (``MuRaL/training.py:240-243``).  On TPU we instead run a single
background thread that assembles numpy batches and eagerly issues
``jax.device_put`` so DMA overlaps with the previous step's compute
(`flax.jax_utils.prefetch_to_device`-style, but for our Batch struct).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp

from mural_tpu.data.batcher import Batch


class DeviceBatch:
    __slots__ = ("y", "cat", "cont", "distal", "mask", "n_valid", "rows",
                 "distal_tracks")

    def __init__(self, y, cat, cont, distal, mask, n_valid, rows,
                 distal_tracks=None):
        self.y = y
        self.cat = cat
        self.cont = cont
        self.distal = distal
        self.mask = mask
        self.n_valid = n_valid
        self.rows = rows
        self.distal_tracks = distal_tracks


class StackedDeviceBatch:
    """K host batches stacked on a leading axis and device-put as one
    transfer each, for the scan train step
    (train/packed.make_packed_train_step_scan)."""
    __slots__ = ("k", "y", "cat", "cont", "distal", "mask", "n_valids",
                 "distal_tracks")

    def __init__(self, k, y, cat, cont, distal, mask, n_valids,
                 distal_tracks=None):
        self.k = k
        self.y = y
        self.cat = cat
        self.cont = cont
        self.distal = distal
        self.mask = mask
        self.n_valids = n_valids
        self.distal_tracks = distal_tracks


def _putter(device=None, sharding=None) -> Callable:
    if sharding is not None:
        return lambda x: jax.device_put(x, sharding)
    return lambda x: jax.device_put(x, device)


def _valid_mask(batch: Batch):
    import numpy as np
    return (np.arange(len(batch.y)) < batch.n_valid).astype(np.float32)


def to_device(batch: Batch, device=None, sharding=None) -> DeviceBatch:
    put = _putter(device, sharding)
    return DeviceBatch(
        y=put(batch.y),
        cat=put(batch.cat),
        cont=None if batch.cont is None else put(batch.cont),
        distal=put(batch.distal),
        mask=put(_valid_mask(batch)),
        n_valid=batch.n_valid,
        rows=batch.rows,
        distal_tracks=(None if batch.distal_tracks is None
                       else put(batch.distal_tracks)),
    )


def _stack_group(group, device=None, sharding=None) -> StackedDeviceBatch:
    import numpy as np
    put = _putter(device, sharding)
    return StackedDeviceBatch(
        k=len(group),
        y=put(np.stack([b.y for b in group])),
        cat=put(np.stack([b.cat for b in group])),
        cont=(None if group[0].cont is None
              else put(np.stack([b.cont for b in group]))),
        distal=put(np.stack([b.distal for b in group])),
        mask=put(np.stack([_valid_mask(b) for b in group])),
        n_valids=[b.n_valid for b in group],
        distal_tracks=(None if group[0].distal_tracks is None
                       else put(np.stack([b.distal_tracks
                                          for b in group]))),
    )


def _threaded_iter(produce: Callable, size: int) -> Iterator:
    """Run ``produce(emit)`` on a worker thread, yielding what it emits
    through a bounded queue.  ``emit(item) -> bool`` returns False when
    the consumer abandoned the generator (break / exception), so the
    worker does not block forever on a full queue holding device
    buffers; worker exceptions re-raise in the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()
    err: list = []
    stop = threading.Event()

    def emit(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            produce(emit)
        except BaseException as e:  # surfaced in the consumer
            err.append(e)
        finally:
            emit(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def prefetch(batches: Iterator[Batch], size: int = 2, device=None,
             sharding=None) -> Iterator[DeviceBatch]:
    """Wrap a host batch iterator with a device-put prefetch thread."""
    def produce(emit):
        for b in batches:
            if not emit(to_device(b, device=device, sharding=sharding)):
                return

    yield from _threaded_iter(produce, size)


def prefetch_stacked(batches: Iterator[Batch], k: int, size: int = 2,
                     device=None, sharding=None, single_sharding=None):
    """Group ``k`` host batches, stack them on a leading axis, and yield
    :class:`StackedDeviceBatch` objects from a prefetch thread.  A final
    group with fewer than ``k`` batches is yielded as individual
    :class:`DeviceBatch` objects (so only two programs ever compile:
    the K-scan step and the single step).

    ``sharding`` applies to stacked groups (batch on axis 1, e.g.
    ``stacked_batch_sharding``); ``single_sharding`` to the leftover
    single batches (batch on axis 0)."""
    def produce(emit):
        group: list = []
        for b in batches:
            group.append(b)
            if len(group) == k:
                if not emit(_stack_group(group, device=device,
                                         sharding=sharding)):
                    return
                group = []
        for b in group:   # leftovers run the single-step path
            if not emit(to_device(b, device=device,
                                  sharding=single_sharding)):
                return

    yield from _threaded_iter(produce, size)
