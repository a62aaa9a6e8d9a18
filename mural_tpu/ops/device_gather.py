"""Device-side window gather + encode for genome-wide prediction.

Host-side window gathering uploads (batch, width) uint8 tensors per
batch -- ~820 KB for the SNV default, though consecutive genome sites
share all but 2 of their 401 window columns.  Genome-wide prediction
instead uploads each chromosome *chunk's* codes once (uint8, ~2 bytes
per focal site amortised) and turns positions into model inputs
in-graph.  Per batch only (lstart, dstart, neg) vectors travel to the
device -- ~60x less host->device traffic.

Round-4 rework: the original formulation used the natural XLA gathers
(``codes[start + iota]`` for windows, ``comp[win]`` / ``digit[win]``
table lookups), which lower to element-granular serial gathers on TPU
at ~8 ns/element -- profiled at ~14 ms of the 17 ms genome_step at
B=4096 (the model forward is 2.9 ms).  The production paths that
already solved this are reused here:

- windows come from :func:`ops.window_gather.gather_windows_blocked`
  (row-gather at 128-byte granularity + static bit-shift realign --
  the resident-training arena gather);
- the distal window is one-hot encoded on device and strand-resolved
  with the free flip ``one_hot(revcomp(c)) == one_hot(c)[:, ::-1,
  ::-1]`` (no complement table lookup at all; the identity is
  parity-tested in tests/test_encode.py);
- the small local-window lookups (15-entry complement, 15-entry digit
  table) run as iota-compare one-hot matmuls (exact: all values are
  small integers, losslessly representable in f32).

Encodes are bit-identical to the host pipeline
(mural_tpu/genome/encode.py, itself parity-tested against the
reference's seq_digit_encoder / seq_ohe_encoder,
MuRaL/data/preprocessing.py:636-816); equivalence is asserted in
tests/test_device_gather.py.
"""

from __future__ import annotations

import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import COMPLEMENT, N_CODE


def _table_lookup(win, table_np):
    """Small-table lookup as iota-compare + matmul (exact for small
    ints; TPU lowers real gathers to serial dynamic-slice loops)."""
    import jax
    import jax.numpy as jnp
    n = len(table_np)
    t = jnp.asarray(np.asarray(table_np, np.float32).reshape(n, 1))
    oh = (win[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
          ).astype(jnp.float32)
    out = jax.lax.dot_general(
        oh, t, dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)[:, :, 0]
    return out.astype(jnp.int32)


def make_batch_encoder(local_radius: int, local_order: int,
                       distal_radius: int, model_type: str = "snv"):
    """Returns (encode_fn, local_window, distal_window).

    ``encode_fn(codes2d, lstart, dstart, neg) -> (cat_ids, distal_oh)``
    is jit-traceable: ``codes2d`` is a padded uint8 chunk viewed as
    (R, 128) rows (:func:`ops.window_gather.pad_arena_rows`);
    ``lstart`` / ``dstart`` are window starts relative to the flat
    padded chunk and must be in-bounds (the caller pads the chunk by
    the window radius).  ``distal_oh`` is the strand-resolved
    fractional one-hot (B, dw, 4) float32.
    """
    import jax
    import jax.numpy as jnp

    from mural_tpu.models.layers import one_hot_from_codes
    from mural_tpu.ops.window_gather import gather_windows_blocked

    lw = enc.window_size(local_radius, 1, model_type)
    dw = enc.window_size(distal_radius, 1, model_type)
    pad_id = 4 ** local_order

    def encode(codes2d, lstart, dstart, neg):
        dwin = gather_windows_blocked(codes2d, dstart, dw)
        oh = one_hot_from_codes(dwin, jnp.float32)
        oh = jnp.where(neg[:, None, None], oh[:, ::-1, ::-1], oh)

        lwin = gather_windows_blocked(codes2d, lstart, lw
                                      ).astype(jnp.int32)
        comp = _table_lookup(lwin, COMPLEMENT)
        lwin = jnp.where(neg[:, None], comp[:, ::-1], lwin)
        digits = _table_lookup(lwin, enc.DIGIT_TABLE)  # -1 = ambiguous
        if local_order == 1:
            cat = jnp.maximum(digits, 0)          # enc.order1_local clamp
        else:
            cols = lw - local_order + 1
            ids = jnp.zeros(digits.shape[:1] + (cols,), jnp.int32)
            bad = jnp.zeros_like(ids, dtype=bool)
            for d in range(local_order):          # static k: unrolled
                sl = jax.lax.dynamic_slice_in_dim(digits, d, cols, axis=1)
                ids = ids * 4 + jnp.maximum(sl, 0)
                bad = bad | (sl < 0)
            cat = jnp.where(bad, pad_id, ids)     # enc.kmer_ids parity
        return cat.astype(jnp.int32), oh

    return encode, lw, dw


def make_batch_code_encoder(local_radius: int, local_order: int,
                            distal_radius: int,
                            model_type: str = "snv"):
    """Code-level variant for the fused-inference path (the Pallas stem
    consumes codes, not one-hot): ``encode_fn(codes2d, lstart, dstart,
    neg) -> (cat_ids, distal_codes)`` with reverse-complemented codes
    on the negative strand."""
    import jax.numpy as jnp

    from mural_tpu.ops.window_gather import gather_windows_blocked

    base, lw, dw = make_batch_encoder(local_radius, local_order,
                                      distal_radius, model_type)

    def encode(codes2d, lstart, dstart, neg):
        cat, _ = base(codes2d, lstart, dstart, neg)
        dwin = gather_windows_blocked(codes2d, dstart, dw
                                      ).astype(jnp.int32)
        comp = _table_lookup(dwin, COMPLEMENT)
        dwin = jnp.where(neg[:, None], comp[:, ::-1], dwin)
        return cat, dwin.astype(jnp.uint8)

    return encode, lw, dw


def iter_code_chunks(genome, chrom: str, margin: int,
                     chunk: int = 1 << 22):
    """Yield (lo, hi, padded_codes) covering one chromosome.

    ``padded_codes`` has fixed length ``chunk + 2*margin`` (constant jit
    shape): positions [margin, margin + (hi-lo)) hold codes[lo:hi], the
    flanks hold real neighbouring codes where the chromosome continues
    and N elsewhere.  A window start relative to the padded array is
    ``abs_start - lo + margin``.
    """
    codes = genome[chrom]
    n = len(codes)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        padded = np.full(chunk + 2 * margin, N_CODE, dtype=np.uint8)
        src_lo = max(lo - margin, 0)
        src_hi = min(hi + margin, n)
        padded[src_lo - lo + margin: src_hi - lo + margin] = \
            codes[src_lo:src_hi]
        yield lo, hi, padded
