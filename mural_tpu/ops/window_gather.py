"""Blocked window gather from a resident code arena.

The resident training/predict paths need ``out[b] = arena[astart[b] :
astart[b] + dw]`` — B contiguous byte windows at data-dependent
offsets.  XLA lowers the natural ``arena[astart[:, None] + iota(dw)]``
to an element-granular gather costing ~8 ns *per byte*: 6.7 ms for a
(2048, 401) batch on v5e, which throttled the resident train step from
~700k to ~212k windows/s (round-3 measurement; the per-element rate is
the same for a ``vmap(dynamic_slice)`` formulation at ~1.2 us per
slice).

The fix is to gather at 128-byte granularity and realign in vector
registers:

1. view the arena as (A/128, 128) rows; a window starting at ``s``
   lies in rows ``s//128 .. s//128 + NB-1`` (NB = ceil(dw/128)+1);
2. row-gather (B, NB, 128) — 128x fewer gather indices, each a
   contiguous lane-width copy (measured 0.59 ms standalone, ~0.25 ms
   marginal inside the train scan);
3. rotate each row's flattened (NB*128,) window left by ``s % 128``
   with 7 static shift+select stages (one per bit) — branchless VPU
   work, no data-dependent indexing.

Net: 3.17 ms/step (647k windows/s) inside the resident train scan vs
9.65 ms for the element gather; bit-identical output
(tests/test_pallas_ops.py).

Dead end, recorded: a Pallas kernel issuing one async DMA per window
(scalar-prefetched ``astart``, HBM->VMEM copies) is the natural
hardware mapping, but Mosaic requires both the slice *shape* and the
dynamic *offset* of 1-D int8 HBM memref slices to be 1024-byte aligned
("Failed to prove that a tile index in dimension 0 is divisible by the
tiling (1024)") — data-dependent byte offsets cannot satisfy it, and
realigning inside the kernel reintroduces the dynamic-lane-shift
problem the blocked-XLA form solves with static shifts.  Revisit only
if Mosaic gains unaligned DMA support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def n_blocks(dw: int) -> int:
    """Rows of 128 covering any 128-phase window of length dw."""
    return -(-dw // 128) + 1


def pad_arena_rows(arena_1d, dw: int):
    """(A,) uint8 -> (R, 128) uint8 padded so every in-range window's
    row span stays in bounds.  Pads with zeros; callers guarantee
    astart + dw <= A (build_arena already N-pads its tail)."""
    import numpy as np
    nb = n_blocks(dw)
    a = np.asarray(arena_1d)
    total = (-(-len(a) // 128) + nb) * 128
    out = np.zeros(total, dtype=np.uint8)
    out[:len(a)] = a
    return out.reshape(-1, 128)


def gather_windows_reference(arena, astart, dw: int):
    """Element-gather oracle on the flat arena (slow on TPU; used for
    tests and as the semantic definition)."""
    return arena[astart[:, None]
                 + jnp.arange(dw, dtype=astart.dtype)[None, :]]


@functools.partial(jax.jit, static_argnames=("dw",))
def gather_windows_blocked(arena2d, astart, dw: int):
    """arena2d (R, 128) uint8, astart (B,) int -> (B, dw) uint8."""
    nb = n_blocks(dw)
    r0 = (astart // 128).astype(jnp.int32)
    rows = arena2d[r0[:, None]
                   + jnp.arange(nb, dtype=jnp.int32)[None, :]]
    x = rows.reshape(rows.shape[0], nb * 128)
    o = (astart % 128).astype(jnp.int32)
    for j in (64, 32, 16, 8, 4, 2, 1):
        shifted = jnp.concatenate([x[:, j:], x[:, :j]], axis=1)
        x = jnp.where(((o & j) != 0)[:, None], shifted, x)
    return x[:, :dw]
