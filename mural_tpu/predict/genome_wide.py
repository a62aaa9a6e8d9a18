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
- chromosome chunk codes are uploaded to the device ONCE and windows are
  gathered + encoded in-graph (ops/device_gather.py): per batch only
  three small index vectors travel over the host->device link;
- the async jitted forward is optionally sharded over a device mesh;
- calibration + formatting + gzip run in a PostprocessFarm
  (predict/post_farm.py): inline via the native C++ TSV formatter or
  fanned out over worker processes with byte-identical ordered output.
"""

from __future__ import annotations

import dataclasses
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
    batch_size: int = 4096           # measured optimum: 212-216k
                                     # sites/s vs 199-206k at 8192/16384
                                     # on a 1-core host (docs/design.md)
    flush_batches: Optional[int] = None  # transfer/write window
                                     # (batches); None = ~64k sites
                                     # per flush (measured optimum:
                                     # larger windows stall the 2-deep
                                     # drain queue on huge transfers,
                                     # smaller ones pay per-flush
                                     # concat/submit overhead)
    chunk_size: int = 1 << 22        # codes uploaded per device chunk
    n_devices: int = 1
    n_workers: Optional[int] = None  # postprocess worker processes;
                                     # None = auto-size from the host
                                     # core count (post_farm.
                                     # auto_n_workers: inline on <=2
                                     # cores -- measured faster there --
                                     # else cores-2 capped at 6)
    fused_inference: bool = False    # BN-folded fused forward (SNV m2)
    progress_every: int = 2000       # batches between progress prints
    time_view: bool = False          # print a phase-timing table


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
    from mural_tpu.utils.pandas_safe import ensure_object_strings
    ensure_object_strings()
    import jax
    import jax.numpy as jnp

    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    _enable_compilation_cache()
    from mural_tpu.models.init import materialize_variables
    from mural_tpu.ops.device_gather import (iter_code_chunks,
                                             make_batch_encoder)
    from mural_tpu.predict.pipeline import build_model_from_config

    t0 = time.time()
    phases: dict = {}

    def _phase(name):
        now = time.time()
        phases[name] = now - _phase.last
        _phase.last = now
    _phase.last = t0

    config = load_config(opts.model_config_path)
    n_class = config["n_class"]
    if config.get("n_cont", 0):
        raise ValueError(
            "this checkpoint was trained with bigWig track features "
            f"(n_cont={config['n_cont']}); genome-wide prediction does "
            "not generate continuous features -- use `predict` with a "
            "BED and --bw_paths instead")
    genome = Genome.from_fasta(opts.ref_genome)
    _phase("load genome")

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
    # flat-packed inference buffers: 2 input leaves per batch instead of
    # ~480 (train/packed.py)
    from mural_tpu.train.packed import pack_variables, unpack_tree
    flat_p, flat_s, p_spec, s_spec = pack_variables(params, batch_stats)
    _phase("load checkpoint")

    calibr = (load_calibrator(opts.calibrator_path)
              if opts.calibrator_path else None)

    if opts.n_devices > 1:
        from mural_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated)
        mesh = make_mesh(opts.n_devices)
        sharding = batch_sharding(mesh)
        flat_p = jax.device_put(flat_p, replicated(mesh))
        flat_s = jax.device_put(flat_s, replicated(mesh))
        per = -(-opts.batch_size // opts.n_devices)
        batch_size = per * opts.n_devices
    else:
        sharding = None
        batch_size = opts.batch_size

    # device-side window gather + encode (ops/device_gather.py): chunk
    # codes go up once (as a (R, 128) rows view for the blocked window
    # gather), per batch only (lstart, dstart, neg) vectors travel --
    # ~60x less host->device traffic than host gathering
    if (opts.fused_inference and model_type == "snv"
            and config.get("model_no") == 2):
        from mural_tpu.ops.device_gather import make_batch_code_encoder
        from mural_tpu.ops.fused_inference import (fold_snv2,
                                                   snv2_fused_forward)
        encode_fn, _, _ = make_batch_code_encoder(
            local_radius, local_order, distal_radius, model_type)
        folded = fold_snv2({"params": params,
                            "batch_stats": batch_stats}, config)
        k_stem = config["CNN_kernel_size"]

        def forward(p_, bs_, cat, distal):
            return snv2_fused_forward(folded, cat, distal, k=k_stem)
    else:
        encode_fn, _, _ = make_batch_encoder(local_radius, local_order,
                                             distal_radius, model_type)

        def forward(p_, bs_, cat, distal):
            return model.apply({"params": unpack_tree(p_, p_spec),
                                "batch_stats": unpack_tree(bs_, s_spec)},
                               cat, None, distal, False)

    @jax.jit
    def genome_step(p_, bs_, codes2d, packed):
        # packed: (B, 3) int32 = [lstart, dstart, neg] -- one transfer
        # per batch instead of three (each host->device put is a tunnel
        # round trip on remote-device setups)
        lstart, dstart = packed[:, 0], packed[:, 1]
        neg = packed[:, 2].astype(bool)
        cat, distal = encode_fn(codes2d, lstart, dstart, neg)
        return forward(p_, bs_, cat, distal)

    prob_names = [f"prob{i}" for i in range(n_class)]
    margin = max(distal_radius, local_radius + local_order) + 2
    chunk_len = opts.chunk_size
    fwd_code = rev_code = None
    if opts.focal_base != "all":
        from mural_tpu.genome.fasta import encode_sequence
        fwd_code = encode_sequence(opts.focal_base)[0]
        rev_code = COMPLEMENT[fwd_code]

    if sharding is not None:
        from mural_tpu.parallel.mesh import replicated as _replicated
        rep_sharding = _replicated(mesh)

        def _put(x, replicate=False):
            return jax.device_put(
                x, rep_sharding if replicate else sharding)
    else:
        def _put(x, replicate=False):
            return jax.device_put(x)  # async: overlaps with compute

    meta: List = []

    def host_batches():
        """Yield (chunk_key, padded_or_None, packed, n_valid, meta_row):
        padded codes only on the first batch of each chunk."""
        for chrom in (opts.chroms or genome.names()):
            for lo, hi, padded in iter_code_chunks(genome, chrom,
                                                   margin, chunk_len):
                from mural_tpu.ops.window_gather import pad_arena_rows
                padded = pad_arena_rows(padded, dw)   # (R, 128) view
                part = genome[chrom][lo:hi]
                if opts.focal_base == "all":
                    pos = np.arange(lo, hi, dtype=np.int64)
                    neg = np.zeros(len(pos), bool)
                else:
                    pos_f = lo + np.nonzero(part == fwd_code)[0]
                    pos_r = lo + np.nonzero(part == rev_code)[0]
                    pos = np.concatenate([pos_f, pos_r])
                    neg = np.concatenate([np.zeros(len(pos_f), bool),
                                          np.ones(len(pos_r), bool)])
                    order = np.argsort(pos, kind="stable")
                    pos, neg = pos[order], neg[order]
                if not len(pos):
                    continue
                first = True
                for b0 in range(0, len(pos), batch_size):
                    p = pos[b0:b0 + batch_size]
                    ng = neg[b0:b0 + batch_size]
                    n_valid = len(p)
                    if n_valid < batch_size:
                        pad = batch_size - n_valid
                        p = np.concatenate(
                            [p, np.full(pad, lo, np.int64)])
                        ng = np.concatenate([ng, np.zeros(pad, bool)])
                    rel = (-lo + margin)
                    packed = np.empty((batch_size, 3), np.int32)
                    packed[:, 0] = (enc.expanded_start(
                        p, local_radius, model_type) + rel)
                    packed[:, 1] = (enc.expanded_start(
                        p, distal_radius, model_type) + rel)
                    packed[:, 2] = ng
                    yield (padded if first else None, packed, n_valid,
                           (chrom, p[:n_valid], ng[:n_valid]))
                    first = False

    def device_batches():
        """Prefetch thread device_puts chunk codes + packed indices one
        batch ahead so transfers overlap compute; yields
        (logits_device, n_valid) with meta appended in order."""
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=4)
        _END = object()
        err: List = []
        stop = threading.Event()

        def worker():
            codes_dev = None
            try:
                for padded, packed, n_valid, mrow in host_batches():
                    if padded is not None:
                        codes_dev = _put(padded, replicate=True)
                    item = (codes_dev, _put(packed), n_valid, mrow)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    else:
                        return
            except BaseException as e:
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(_END, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    if err:
                        raise err[0]
                    return
                codes_dev, packed_dev, n_valid, mrow = item
                step_t0 = time.time()
                lg = genome_step(flat_p, flat_s, codes_dev,
                                 packed_dev)
                if "first step (compile)" not in phases:
                    phases["first step (compile)"] = (time.time()
                                                      - step_t0)
                meta.append(mrow)
                yield lg, n_valid
        finally:
            stop.set()

    # calibration + %.4g formatting + gzip run in the PostprocessFarm:
    # inline (native C++ formatter, ~12x the pandas path) or fanned out
    # over n_workers processes with ordered writes
    from mural_tpu.predict.post_farm import PostprocessFarm, auto_n_workers
    n_workers = (auto_n_workers() if opts.n_workers is None
                 else opts.n_workers)
    farm = PostprocessFarm(
        opts.pred_file,
        ["chrom", "start", "end", "strand", "mut_type"] + prob_names,
        calibrator=calibr,
        poisson=(opts.poisson_calib or model_type == "indel"),
        n_workers=n_workers)

    pending: List = []
    pending_valid: List[int] = []
    submitted = 0
    batch_count = 0
    flush_batches = (opts.flush_batches if opts.flush_batches
                     else max(4, 65536 // batch_size))

    # flush windows drain on a separate thread: the device->host logits
    # transfer (one packed concat per window) and the postprocess submit
    # overlap the main loop's dispatching, so the device never waits on
    # the host fetch
    import queue
    import threading
    drain_q: "queue.Queue" = queue.Queue(maxsize=2)
    drain_err: List = []

    def drain_worker():
        nonlocal submitted
        while True:
            item = drain_q.get()
            if item is None:
                return
            dev_flat, valids, meta_rows = item
            try:
                flat = np.asarray(dev_flat)
                logits_np = [flat[i * batch_size:i * batch_size + n]
                             for i, n in enumerate(valids)]
                # one farm chunk per run of same-chrom batches
                i, k = 0, len(valids)
                while i < k:
                    chrom = meta_rows[i][0]
                    j = i
                    while j < k and meta_rows[j][0] == chrom:
                        j += 1
                    pos = np.concatenate(
                        [meta_rows[t][1] for t in range(i, j)])
                    neg = np.concatenate(
                        [meta_rows[t][2] for t in range(i, j)])
                    farm.submit(chrom, pos, neg,
                                np.concatenate(logits_np[i:j]))
                    submitted += len(pos)
                    i = j
            except BaseException as e:
                drain_err.append(e)
                return

    drain_thread = threading.Thread(target=drain_worker, daemon=True)
    drain_thread.start()

    def flush():
        if not pending:
            return
        if drain_err:
            raise drain_err[0]
        # async device-side concat; the drain thread pays the transfer
        dev_flat = jnp.concatenate(pending)
        drain_q.put((dev_flat, list(pending_valid), meta[:len(pending)]))
        del meta[:len(pending)]
        pending.clear()
        pending_valid.clear()

    for lg, n_valid in device_batches():
        pending.append(lg)
        pending_valid.append(n_valid)
        batch_count += 1
        if len(pending) >= flush_batches:
            flush()
        if batch_count % opts.progress_every == 0:
            printer(f"{batch_count} batches, {submitted:,} sites "
                    f"submitted, "
                    f"{submitted / max(time.time() - t0, 1e-9):,.0f} "
                    f"sites/s")
    flush()
    drain_q.put(None)
    drain_thread.join()
    if drain_err:
        raise drain_err[0]
    _phase("device loop + flushes")
    total = farm.close()
    _phase("writer close")
    rate = total / max(time.time() - t0, 1e-9)
    if opts.time_view:
        printer("predict_genome phase timing:")
        loop = phases.get("device loop + flushes", 0.0)
        comp = phases.get("first step (compile)", 0.0)
        phases["device loop + flushes"] = loop - comp
        for name, dt in phases.items():
            printer(f"  {name:<28s} {dt:8.2f}s")
    printer(f"genome-wide predict: {total:,} sites in "
            f"{time.time() - t0:.1f}s = {rate:,.0f} sites/s "
            f"({n_workers} postprocess workers"
            f"{' [auto]' if opts.n_workers is None else ''})")
    return total
