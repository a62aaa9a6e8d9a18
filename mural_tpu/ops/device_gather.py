"""Device-side window gather + encode for genome-wide prediction.

Host-side window gathering uploads (batch, width) uint8 tensors per
batch -- ~820 KB for the SNV default, though consecutive genome sites
share all but 2 of their 401 window columns.  Genome-wide prediction
instead uploads each chromosome *chunk's* codes once (uint8, ~2 bytes
per focal site amortised) and turns positions into model inputs
in-graph:

    window  = chunk_codes[start + arange(width)]        (XLA gather)
    window  = where(neg, complement[window][::-1], window)
    cat     = radix-4 k-mer ids of the local window     (static-k loop)
    distal  = fractional one-hot via table take          (models.layers)

Per batch only (start, start, neg) vectors travel to the device --
~60x less host->device traffic.  Encodes are bit-identical to the host
pipeline (mural_tpu/genome/encode.py, itself parity-tested against the
reference's seq_digit_encoder / seq_ohe_encoder,
MuRaL/data/preprocessing.py:636-816); equivalence is asserted in
tests/test_device_gather.py.
"""

from __future__ import annotations

import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import COMPLEMENT, N_CODE


def make_batch_encoder(local_radius: int, local_order: int,
                       distal_radius: int, model_type: str = "snv"):
    """Returns (encode_fn, local_window, distal_window).

    ``encode_fn(codes, lstart, dstart, neg) -> (cat_ids, distal_codes)``
    is jit-traceable: ``codes`` is a padded uint8 chunk, ``lstart`` /
    ``dstart`` are window starts *relative to the chunk array* and must
    be in-bounds (the caller pads the chunk by the window radius).
    """
    import jax
    import jax.numpy as jnp

    lw = enc.window_size(local_radius, 1, model_type)
    dw = enc.window_size(distal_radius, 1, model_type)
    comp = jnp.asarray(COMPLEMENT)
    digit = jnp.asarray(enc.DIGIT_TABLE.astype(np.int32))
    pad_id = 4 ** local_order

    def encode(codes, lstart, dstart, neg):
        negb = neg[:, None]
        dwin = codes[dstart[:, None]
                     + jnp.arange(dw, dtype=lstart.dtype)[None, :]]
        dwin = jnp.where(negb, comp[dwin][:, ::-1], dwin)
        lwin = codes[lstart[:, None]
                     + jnp.arange(lw, dtype=lstart.dtype)[None, :]]
        lwin = jnp.where(negb, comp[lwin][:, ::-1], lwin)
        digits = digit[lwin]                      # (B, lw), -1 ambiguous
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
        return cat.astype(jnp.int32), dwin

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
