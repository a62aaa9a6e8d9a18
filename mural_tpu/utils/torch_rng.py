"""Torch-exact randperm without torch.

The reference splits train/valid segments with
``torch.random_split(..., generator=torch.Generator().manual_seed(seed))``
(MuRaL/training.py:220-229), which reduces to ``torch.randperm`` on a
manually seeded CPU generator.  To keep the documented torch-parity
contract *without* requiring torch at runtime, this module reproduces
torch's exact stream:

- ``CPUGeneratorImpl.manual_seed`` truncates the seed to 32 bits and
  seeds a standard MT19937 (init_genrand; aten mt19937.h is a direct
  translation of the reference Mersenne Twister),
- ``randperm_cpu`` is an in-place Fisher-Yates using
  ``generator->random() % (n - i)`` per step, where ``random()`` is the
  raw tempered 32-bit MT19937 output
  (aten/src/ATen/native/TensorFactories.cpp).

Verified bit-exact against torch in tests/test_torch_rng.py.
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER = 0x80000000
_LOWER = 0x7FFFFFFF


class MT19937:
    """Standard MT19937 with torch's manual_seed semantics."""

    def __init__(self, seed: int):
        seed = int(seed) & 0xFFFFFFFF  # torch truncates to 32 bits
        state = np.empty(_N, dtype=np.uint64)
        x = seed
        state[0] = x
        for i in range(1, _N):
            x = (1812433253 * (x ^ (x >> 30)) + i) & 0xFFFFFFFF
            state[i] = x
        self._state = state.astype(np.uint32)
        self._buf = np.empty(0, dtype=np.uint32)
        self._pos = 0

    def _generate_block(self) -> None:
        # faithful genrand_int32 block update: the twist reads entries
        # already updated in this pass (mt[kk+M-N] and the final mt[0]),
        # so the loop is genuinely sequential -- kept as a plain loop
        # (randperm over segment counts draws a few thousand values at
        # most; this is microseconds)
        mt = self._state.tolist()
        for kk in range(_N):
            y = (mt[kk] & _UPPER) | (mt[(kk + 1) % _N] & _LOWER)
            mt[kk] = (mt[(kk + _M) % _N] ^ (y >> 1)
                      ^ (_MATRIX_A if y & 1 else 0))
        self._state = np.asarray(mt, dtype=np.uint32)
        # tempering (vectorizable: pure function of the new state)
        t = self._state.astype(np.uint64)
        t ^= t >> np.uint64(11)
        t ^= (t << np.uint64(7)) & np.uint64(0x9D2C5680)
        t ^= (t << np.uint64(15)) & np.uint64(0xEFC60000)
        t ^= t >> np.uint64(18)
        self._buf = (t & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        self._pos = 0

    def random_uint32(self) -> int:
        if self._pos >= len(self._buf):
            self._generate_block()
        v = int(self._buf[self._pos])
        self._pos += 1
        return v


def torch_randperm(n: int, seed: int) -> np.ndarray:
    """Bit-exact ``torch.randperm(n, generator=Generator().manual_seed(
    seed))`` as an int64 numpy array."""
    gen = MT19937(seed)
    perm = np.arange(n, dtype=np.int64)
    for i in range(n - 1):
        z = gen.random_uint32() % (n - i)
        perm[i], perm[z + i] = perm[z + i], perm[i]
    return perm
