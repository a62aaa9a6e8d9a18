"""Device-side gather/encode equivalence with the host pipeline (CPU)."""
import numpy as np
import pytest


@pytest.mark.parametrize("model_type,local_order", [("snv", 3),
                                                    ("snv", 1),
                                                    ("indel", 2)])
def test_device_encode_matches_host(rng, model_type, local_order):
    import jax.numpy as jnp

    from mural_tpu import native
    from mural_tpu.genome import encode as enc
    from mural_tpu.genome.fasta import N_CODE
    from mural_tpu.ops.device_gather import make_batch_encoder

    local_radius, distal_radius = 4, 30
    n_chunk, margin = 2000, 40
    codes = rng.integers(0, 15, size=n_chunk).astype(np.uint8)
    padded = np.concatenate([np.full(margin, N_CODE, np.uint8), codes,
                             np.full(margin, N_CODE, np.uint8)])

    pos = rng.integers(0, n_chunk, 64).astype(np.int64)
    neg = rng.random(64) < 0.5

    # host path (parity-tested against the reference encoders)
    lw = enc.window_size(local_radius, 1, model_type)
    dw = enc.window_size(distal_radius, 1, model_type)
    lstart = enc.expanded_start(pos, local_radius, model_type)
    dstart = enc.expanded_start(pos, distal_radius, model_type)
    lwin = native.gather_windows(codes, lstart, lw, neg)
    dwin = native.gather_windows(codes, dstart, dw, neg)
    cat_host = (native.kmer_pack(lwin, local_order) if local_order > 1
                else enc.order1_local(lwin, model_type).astype(np.int32))

    # device path: indices relative to the padded chunk, codes viewed
    # as (R, 128) rows for the blocked window gather
    from mural_tpu.genome.encode import ONE_HOT_TABLE
    from mural_tpu.ops.device_gather import make_batch_code_encoder
    from mural_tpu.ops.window_gather import pad_arena_rows

    padded2d = jnp.asarray(pad_arena_rows(padded, dw))
    lstart_d = jnp.asarray((lstart + margin), dtype=jnp.int32)
    dstart_d = jnp.asarray((dstart + margin), dtype=jnp.int32)
    neg_d = jnp.asarray(neg)

    encode_fn, lw2, dw2 = make_batch_encoder(
        local_radius, local_order, distal_radius, model_type)
    assert (lw2, dw2) == (lw, dw)
    cat_dev, oh_dev = encode_fn(padded2d, lstart_d, dstart_d, neg_d)
    np.testing.assert_array_equal(np.asarray(cat_dev), cat_host)
    # strand-resolved one-hot must equal the host one-hot of the
    # strand-resolved codes (bit-equality incl. fractional IUPAC rows)
    np.testing.assert_array_equal(np.asarray(oh_dev), ONE_HOT_TABLE[dwin])

    # code-level variant (fused-inference path) returns the codes
    code_fn, _, _ = make_batch_code_encoder(
        local_radius, local_order, distal_radius, model_type)
    cat2, dwin_dev = code_fn(padded2d, lstart_d, dstart_d, neg_d)
    np.testing.assert_array_equal(np.asarray(cat2), cat_host)
    np.testing.assert_array_equal(np.asarray(dwin_dev), dwin)


def test_iter_code_chunks_pads_with_real_neighbours(tiny_genome):
    from mural_tpu.genome.fasta import Genome, N_CODE
    from mural_tpu.ops.device_gather import iter_code_chunks

    g = Genome.from_fasta(tiny_genome["path"])
    codes = g["chr1"]
    margin, chunk = 50, 4096
    chunks = list(iter_code_chunks(g, "chr1", margin, chunk))
    assert chunks[0][0] == 0
    lo, hi, padded = chunks[1]
    assert len(padded) == chunk + 2 * margin
    # interior flank = real neighbouring codes, not N
    np.testing.assert_array_equal(padded[:margin],
                                  codes[lo - margin:lo])
    np.testing.assert_array_equal(padded[margin:margin + (hi - lo)],
                                  codes[lo:hi])
    # chromosome start flank of chunk 0 is N
    assert (chunks[0][2][:margin] == N_CODE).all()
    # last chunk: tail beyond the chromosome is N
    lo_l, hi_l, padded_l = chunks[-1]
    used = hi_l - lo_l
    assert (padded_l[margin + used + margin:] == N_CODE).all()
    # whole chromosome covered exactly once
    assert sum(h - l for l, h, _ in chunks) == len(codes)
