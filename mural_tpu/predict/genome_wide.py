"""Genome-wide mutation-rate map engine.

The reference has no in-process genome-wide mode: its docs instruct users
to split a BED of all sites into ~1M-site chunks and launch many
``predict --cpu_only`` processes (MuRaL/commands/predict.py:135-138,
docs/usage.rst:169-171).  Here the whole flow runs in one process,
TPU-first:

- sites are *generated* directly from the uint8 genome codes (all
  positions whose focal base matches the model's training base on either
  strand -- the MuRaL convention of per-focal-base models), no BED
  materialisation;
- fixed-size batches stream through a double-buffered prefetch into an
  async jitted forward (optionally sharded over a device mesh);
- results stream to a gzip TSV writer in bounded-memory flushes.
"""

from __future__ import annotations

import dataclasses
import gzip
import time
from typing import Iterator, List, Optional, Sequence

import numpy as np

from mural_tpu.genome import encode as enc
from mural_tpu.genome.fasta import COMPLEMENT, Genome, decode_sequence
from mural_tpu.train.checkpoint import (load_calibrator, load_checkpoint,
                                        load_config)


@dataclasses.dataclass
class GenomePredictOptions:
    ref_genome: str
    model_path: str
    model_config_path: str
    pred_file: str = "genome_pred.tsv.gz"
    calibrator_path: str = ""
    poisson_calib: bool = False
    focal_base: str = "A"            # model's focal base ('A' or 'C')
    chroms: Optional[Sequence[str]] = None
    batch_size: int = 2048
    flush_batches: int = 256         # transfer/write cadence
    n_devices: int = 1
    fused_inference: bool = False    # BN-folded fused forward (SNV m2)
    progress_every: int = 2000       # batches between progress prints


def iter_focal_sites(genome: Genome, focal_base: str,
                     chroms: Optional[Sequence[str]] = None,
                     chunk: int = 4_000_000
                     ) -> Iterator[tuple]:
    """Yield (chrom_name, positions int64 array, strand_neg bool array)
    chunks: '+' sites where the base == focal_base, '-' sites where it is
    the complement (so the model always reads its focal base).

    ``focal_base='all'`` emits every position on the '+' strand -- the
    INDEL mode, where models are not focal-base specific (gaps can occur
    anywhere)."""
    from mural_tpu.genome.fasta import encode_sequence
    if focal_base == "all":
        for chrom in (chroms or genome.names()):
            n = len(genome[chrom])
            for lo in range(0, n, chunk):
                pos = np.arange(lo, min(lo + chunk, n), dtype=np.int64)
                yield chrom, pos, np.zeros(len(pos), bool)
        return
    fwd_code = encode_sequence(focal_base)[0]
    rev_code = COMPLEMENT[fwd_code]
    for chrom in (chroms or genome.names()):
        codes = genome[chrom]
        for lo in range(0, len(codes), chunk):
            part = codes[lo:lo + chunk]
            pos_f = lo + np.nonzero(part == fwd_code)[0]
            pos_r = lo + np.nonzero(part == rev_code)[0]
            pos = np.concatenate([pos_f, pos_r])
            neg = np.concatenate([np.zeros(len(pos_f), bool),
                                  np.ones(len(pos_r), bool)])
            order = np.argsort(pos, kind="stable")
            yield chrom, pos[order], neg[order]


def run_genome_predict(opts: GenomePredictOptions,
                       model_type: str = "snv", printer=print) -> int:
    """Returns the number of sites written."""
    import jax
    import jax.numpy as jnp

    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    _enable_compilation_cache()
    from mural_tpu.data.batcher import Batch
    from mural_tpu.data.prefetch import prefetch
    from mural_tpu import native
    from mural_tpu.models.init import materialize_variables
    from mural_tpu.predict.pipeline import build_model_from_config
    from mural_tpu.train.steps import make_eval_step

    t0 = time.time()
    config = load_config(opts.model_config_path)
    n_class = config["n_class"]
    genome = Genome.from_fasta(opts.ref_genome)

    model = build_model_from_config(config, 0, model_type)
    local_radius = config["local_radius"]
    local_order = config["local_order"]
    distal_radius = config["distal_radius"]
    lw = enc.window_size(local_radius, 1, model_type)
    dw = enc.window_size(distal_radius, 1, model_type)
    n_cat = enc.window_size(local_radius, local_order, model_type)

    template = jax.eval_shape(
        lambda k, c, d: model.init(k, c, None, d, False),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((2, n_cat), jnp.int32),
        jax.ShapeDtypeStruct((2, dw, 4), jnp.float32))
    variables = materialize_variables(
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {})}, 0)
    restored = jax.device_put(load_checkpoint(opts.model_path, variables))
    params, batch_stats = restored["params"], restored["batch_stats"]

    calibr = (load_calibrator(opts.calibrator_path)
              if opts.calibrator_path else None)

    if opts.n_devices > 1:
        from mural_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated)
        mesh = make_mesh(opts.n_devices)
        sharding = batch_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))
        batch_stats = jax.device_put(batch_stats, replicated(mesh))
        per = -(-opts.batch_size // opts.n_devices)
        batch_size = per * opts.n_devices
    else:
        sharding = None
        batch_size = opts.batch_size

    if (opts.fused_inference and model_type == "snv"
            and config.get("model_no") == 2):
        import jax.numpy as jnp
        from mural_tpu.ops.fused_inference import (fold_snv2,
                                                   snv2_fused_forward)
        folded = fold_snv2({"params": params,
                            "batch_stats": batch_stats}, config)
        k_stem = config["CNN_kernel_size"]

        @jax.jit
        def eval_step(p_, bs_, y, cat, cont, distal_codes, mask):
            logits = snv2_fused_forward(folded, cat, distal_codes,
                                        k=k_stem)
            return logits, jnp.zeros((), jnp.float32)
    else:
        eval_step = make_eval_step(model)
    prob_names = [f"prob{i}" for i in range(n_class)]

    def batches() -> Iterator[Batch]:
        buf_pos: List[np.ndarray] = []
        for chrom, pos, neg in iter_focal_sites(genome, opts.focal_base,
                                                opts.chroms):
            codes = genome[chrom]
            for lo in range(0, len(pos), batch_size):
                p = pos[lo:lo + batch_size]
                ng = neg[lo:lo + batch_size]
                n_valid = len(p)
                if n_valid < batch_size:
                    pad = batch_size - n_valid
                    p = np.concatenate([p, np.zeros(pad, np.int64)])
                    ng = np.concatenate([ng, np.zeros(pad, bool)])
                lstart = enc.expanded_start(p, local_radius, model_type)
                dstart = enc.expanded_start(p, distal_radius, model_type)
                lwin = native.gather_windows(codes, lstart, lw, ng)
                distal = native.gather_windows(codes, dstart, dw, ng)
                cat = (native.kmer_pack(lwin, local_order)
                       if local_order > 1
                       else enc.order1_local(lwin, model_type)
                       .astype(np.int32))
                yield Batch(y=np.zeros(batch_size, np.int32),
                            cat=cat.astype(np.int32), cont=None,
                            distal=distal, n_valid=n_valid,
                            rows=p), chrom, ng

    # wrap to fit prefetch's Batch-only contract
    meta: List = []

    def batch_stream():
        for b, chrom, ng in batches():
            meta.append((chrom, b.rows[:b.n_valid].copy(),
                         ng[:b.n_valid].copy()))
            yield b

    # compresslevel 1: ~3x faster writes at modest size cost -- the writer
    # shares the single host core with the gather/calibration pipeline
    out_fh = (gzip.open(opts.pred_file, "wt", compresslevel=1)
              if opts.pred_file.endswith(".gz")
              else open(opts.pred_file, "w"))
    out_fh.write("\t".join(["chrom", "start", "end", "strand"]
                           + prob_names) + "\n")

    pending: List = []
    pending_valid: List[int] = []
    total = 0
    batch_count = 0

    def flush():
        nonlocal total
        if not pending:
            return
        logits = np.concatenate(
            [np.asarray(lg)[:n] for lg, n in
             zip(pending, pending_valid)])
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        if calibr is not None:
            probs = calibr.predict_proba(probs)
        if opts.poisson_calib or model_type == "indel":
            from mural_tpu.calibrate import poisson_calibrate
            probs = poisson_calibrate(probs)
        import pandas as pd
        chroms = np.concatenate([np.full(len(p), c)
                                 for c, p, _ in meta[:len(pending)]])
        pos = np.concatenate([p for _, p, _ in meta[:len(pending)]])
        neg = np.concatenate([g for _, _, g in meta[:len(pending)]])
        df = pd.DataFrame({"chrom": chroms, "start": pos,
                           "end": pos + 1,
                           "strand": np.where(neg, "-", "+")})
        for j in range(n_class):
            # pre-format with vectorized %.4g: pandas' float_format path
            # formats via a Python call per cell and dominates runtime
            df[prob_names[j]] = np.char.mod("%.4g", probs[:, j])
        df.to_csv(out_fh, sep="\t", header=False, index=False)
        del meta[:len(pending)]
        total += len(df)
        pending.clear()
        pending_valid.clear()

    for db in prefetch(batch_stream(), size=2, sharding=sharding):
        lg, _ = eval_step(params, batch_stats, db.y, db.cat, db.cont,
                          db.distal, db.mask)
        pending.append(lg)
        pending_valid.append(db.n_valid)
        batch_count += 1
        if len(pending) >= opts.flush_batches:
            flush()
        if batch_count % opts.progress_every == 0:
            printer(f"{batch_count} batches, {total:,} sites written, "
                    f"{total / max(time.time() - t0, 1e-9):,.0f} sites/s")
    flush()
    out_fh.close()
    rate = total / max(time.time() - t0, 1e-9)
    printer(f"genome-wide predict: {total:,} sites in "
            f"{time.time() - t0:.1f}s = {rate:,.0f} sites/s")
    return total
