"""Prediction pipeline (ref MuRaL/scripts/run_predict.py:34-263).

Rehydrates the architecture from the checkpoint's ``model.config.pkl``
(the authoritative record), encodes the test BED, runs batched inference
(optionally sharded over a device mesh -- see
:mod:`mural_tpu.parallel.sharded_predict`), applies the saved Dirichlet
calibrator and/or Poisson calibration, and writes the reference's TSV
schema ``chrom start end strand mut_type prob0..N`` sorted by
(chrom, start) with ``%.4g`` floats.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mural_tpu.data.batcher import segment_pool_batches
from mural_tpu.data.dataset import prepare_dataset
from mural_tpu.data.prefetch import prefetch
from mural_tpu.calibrate import poisson_calibrate
from mural_tpu.evaluation import corr_calc_sub, freq_kmer_comp_multi
from mural_tpu.genome.fasta import Genome
from mural_tpu.genome.tracks import TrackSet, read_track_list
from mural_tpu.models.registry import build_model
from mural_tpu.train.checkpoint import (load_calibrator, load_checkpoint,
                                        load_config)


@dataclasses.dataclass
class PredictOptions:
    test_data: str
    ref_genome: str
    model_path: str
    model_config_path: str
    calibrator_path: str = ""
    pred_file: str = "pred.tsv.gz"
    poisson_calib: bool = False
    pred_batch_size: int = 16
    segment_center: Optional[int] = None
    bw_paths: Optional[str] = None
    kmer_corr: List[int] = dataclasses.field(default_factory=list)
    region_corr: List[int] = dataclasses.field(default_factory=list)
    pred_time_view: bool = False
    n_devices: int = 1                 # shard inference over a mesh
    fused_inference: bool = False      # BN-folded fused forward (SNV m2)
    device: Optional[object] = None
    with_h5: bool = False              # on-disk site-table cache
    h5f_path: Optional[str] = None
    n_h5_files: int = 1                # cache shard count


def build_model_from_config(config: Dict, n_cont: int, model_type: str):
    """run_predict.py:166-181: in_channels and the common config dict.

    in_channels = 4**distal_order + n_cont when the checkpoint was
    trained with per-base distal track channels (the reference promises
    this at training.py:258-260 but its pipeline cannot deliver it --
    here it works; reference torch checkpoints always carry plain 4)."""
    bw_distal = (n_cont > 0
                 and not config.get("without_bw_distal", False)
                 and not config.get("seq_only", False))
    in_channels = (4 ** config.get("distal_order", 1)
                   + (n_cont if bw_distal else 0))
    common = {
        "emb_dims": config["emb_dims"],
        "n_cont": n_cont,
        "n_class": config["n_class"],
        "distal_order": config.get("distal_order", 1),
        "in_channels": in_channels,
    }
    return build_model(config["model_no"], config, common, model_type)


def run_predict(opts: PredictOptions, model_type: str = "snv",
                printer=print) -> "pd.DataFrame":
    from mural_tpu.utils.pandas_safe import ensure_object_strings
    ensure_object_strings()
    import pandas as pd
    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    _enable_compilation_cache()
    start_time = time.time()

    config = load_config(opts.model_config_path)
    segment_center = opts.segment_center or config["segment_center"]
    n_class = config["n_class"]
    seq_only = config.get("seq_only", False)

    tracks = None
    if opts.bw_paths:
        files, names, radii = read_track_list(opts.bw_paths,
                                              config["local_radius"])
        if files:
            tracks = TrackSet(files, names, radii)

    bw_distal = (tracks is not None
                 and not config.get("without_bw_distal", False)
                 and not seq_only)
    genome = Genome.from_fasta(opts.ref_genome)
    if opts.with_h5:
        from mural_tpu.data.cache import prepare_dataset_cached
        ds = prepare_dataset_cached(
            opts.test_data, genome, segment_center,
            config["local_radius"], config["local_order"],
            config["distal_radius"], model_type,
            cache_dir=opts.h5f_path, tracks=tracks, seq_only=seq_only,
            printer=printer, bw_distal=bw_distal,
            n_files=opts.n_h5_files)
    else:
        ds = prepare_dataset(
            opts.test_data, genome, central_bp=segment_center,
            local_radius=config["local_radius"],
            local_order=config["local_order"],
            distal_radius=config["distal_radius"],
            distal_order=config.get("distal_order", 1),
            model_type=model_type, tracks=tracks, seq_only=seq_only,
            bw_distal=bw_distal)
    printer("test set preprocess time:", time.time() - start_time)

    ckpt_n_cont = config.get("n_cont")
    if ckpt_n_cont is not None and ckpt_n_cont != ds.n_cont:
        raise ValueError(
            f"checkpoint was trained with n_cont={ckpt_n_cont} track "
            f"feature(s) but predict got {ds.n_cont} -- pass the same "
            "--bw_paths track list used for training")

    model = build_model_from_config(config, ds.n_cont, model_type)

    from mural_tpu.train.loop import _init_variables
    template = _init_variables(model, ds, 0)
    restored = load_checkpoint(opts.model_path, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {})})
    # restored leaves are host numpy; pin them on device ONCE -- otherwise
    # every jitted call re-uploads ~300 small buffers, which is ruinous
    # through a per-transfer-latency transport
    restored = jax.device_put(restored, opts.device)
    params, batch_stats = restored["params"], restored["batch_stats"]
    # flat-packed inference buffers: 2 input leaves per batch instead of
    # ~480 (train/packed.py -- measured 2.5x on the eval forward)
    from mural_tpu.train.packed import (make_packed_eval_step,
                                        pack_variables)
    flat_p, flat_s, p_spec, s_spec = pack_variables(params, batch_stats)

    prob_names = [f"prob{i}" for i in range(n_class)]
    test_size = ds.n_sites

    use_fused = (opts.fused_inference and model_type == "snv"
                 and config.get("model_no") == 2 and ds.n_cont == 0)
    if opts.fused_inference and not use_fused:
        printer("NOTE: --fused_inference only supports SNV model_no 2 "
                "without continuous features; using the standard path.")
    if use_fused:
        from mural_tpu.ops.fused_inference import (fold_snv2,
                                                   snv2_fused_forward)
        from mural_tpu.train.steps import masked_ce_sum
        folded = fold_snv2({"params": params,
                            "batch_stats": batch_stats}, config)
        k_stem = config["CNN_kernel_size"]

        @jax.jit
        def eval_step(p_, bs_, y, cat, cont, distal_codes, mask,
                      distal_tracks=None):
            logits = snv2_fused_forward(folded, cat, distal_codes,
                                        k=k_stem)
            return logits, masked_ce_sum(logits, y, mask)

    if not use_fused:
        eval_step = make_packed_eval_step(model, (p_spec, s_spec))

    if opts.n_devices > 1:
        from mural_tpu.parallel.sharded_predict import sharded_predict
        logits, total_loss = sharded_predict(
            model, flat_p, flat_s, ds, opts.pred_batch_size,
            opts.n_devices, eval_step=eval_step)
    else:
        import jax.numpy as jnp
        parts = []
        n_valids = []
        loss_dev = jnp.zeros((), jnp.float32)
        batches = segment_pool_batches(ds, 1, opts.pred_batch_size,
                                       shuffle=False, pad_final=True)
        t_fetch = t_pred = 0.0
        t0 = time.time()
        count = 0
        # async dispatch: no per-batch host sync; losses accumulate on
        # device and logits transfer after the pipeline drains
        for db in prefetch(batches, size=2, device=opts.device):
            t_fetch += time.time() - t0
            t1 = time.time()
            lg, loss = eval_step(flat_p, flat_s, db.y, db.cat,
                                 db.cont, db.distal, db.mask,
                                 db.distal_tracks)
            parts.append(lg)
            n_valids.append(db.n_valid)
            loss_dev = loss_dev + loss
            t_pred += time.time() - t1
            count += 1
            if opts.pred_time_view and count % 500 == 0:
                printer(f"batch {count}: fetch {t_fetch:.1f}s "
                        f"predict {t_pred:.1f}s (last 500, async)")
                t_fetch = t_pred = 0.0
            t0 = time.time()
        total_loss = float(loss_dev)
        logits = (np.concatenate(
            [np.asarray(lg)[:n] for lg, n in zip(parts, n_valids)])
            if parts else np.zeros((0, n_class)))

    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    y_prob = pd.DataFrame(probs, columns=prob_names)

    if opts.calibrator_path:
        printer("using calibrator for scaling ...")
        calibr = load_calibrator(opts.calibrator_path)
        y_prob = pd.DataFrame(calibr.predict_proba(y_prob.to_numpy()),
                              columns=prob_names)
    if opts.poisson_calib or model_type == "indel":
        y_prob = poisson_calibrate(y_prob)

    printer("Mean Loss, Total Loss, Test Size:",
            total_loss / max(test_size, 1), total_loss, test_size)

    data_local = ds.local_frame()
    data_and_prob = pd.concat(
        [data_local.reset_index(drop=True), y_prob], axis=1)

    chr_pos = ds.position_frame()
    pred_df = pd.concat(
        [chr_pos, data_and_prob[["mut_type"] + prob_names]], axis=1)
    pred_df.columns = (["chrom", "start", "end", "strand", "mut_type"]
                       + prob_names)
    pred_df = pred_df.sort_values(["chrom", "start"]).reset_index(drop=True)
    if opts.pred_file:
        pred_df.to_csv(opts.pred_file, sep="\t", float_format="%.4g",
                       index=False)

    if opts.kmer_corr:
        if any(k % 2 == 0 or k < 0 for k in opts.kmer_corr):
            printer("Warning: please provide odd positive numbers for "
                    "k-mer lengths", opts.kmer_corr,
                    ". No k-mer correlation was calculated.")
        else:
            from mural_tpu.evaluation.evaluator import _kmer_columns
            for k in opts.kmer_corr:
                missing = [c for c in _kmer_columns(k)
                           if c not in data_and_prob.columns]
                if missing:
                    # same guard as Evaluator.evaluate_kmer: a k larger
                    # than the checkpoint's local window must warn, not
                    # KeyError after the full (hours-long) inference
                    printer(f"Warning: skipping {k}-mer correlation "
                            f"(checkpoint local_radius too small; "
                            f"missing columns {missing})")
                    continue
                corr = freq_kmer_comp_multi(data_and_prob, k, n_class)
                printer(f"{k}mer correlation: ", corr)
                # machine-readable copy for callers (bench.py reads it;
                # DataFrame.attrs rides along without changing the API)
                pred_df.attrs.setdefault("kmer_corr", {})[k] = corr

    if opts.region_corr:
        if min(opts.region_corr) <= 0:
            printer("Warning: please provide positive numbers for window "
                    "sizes. No regional correlation was calculated.")
        else:
            for win in opts.region_corr:
                corr = corr_calc_sub(pred_df, win, prob_names)
                printer("regional corr:", f"{win}bp", corr)

    printer("Total time used: %s seconds" % (time.time() - start_time))
    return pred_df
