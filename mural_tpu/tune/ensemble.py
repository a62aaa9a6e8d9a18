"""Grouped execution of same-shape trials as one vmapped program.

The runner-side half of train/ensemble.py: sampled trial configs are
grouped by *program signature* (every config key that shapes the
compiled program -- architecture, batch_size, optimizer and schedule
kind); members of a group differ only in traced hyperparameters
(learning_rate, weight_decay[_auto], LR_gamma, restart_lr, min_lr) and
seeds, so T members train as ONE jitted epoch dispatch sharing one
dataset encode and one device arena.

Parity surface per member is the standalone trial's
(train/loop.py:175-856): same checkpoint triple per epoch, same
metrics.txt / progress.csv / training.log files, same ASHA report
stream and early stopping -- a member of an ensemble is
indistinguishable on disk from a serially-run trial
(tests/test_ensemble.py::test_ensemble_matches_serial_trials).

Replaces the reference's fractional-GPU packing
(run_train_raytune.py:306: ~6 Ray workers time-slicing one GPU at
gpu_per_trial=0.15) with actual batched execution.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

# config keys that may differ inside one ensemble group (traced values)
VARY_KEYS = frozenset({
    "learning_rate", "weight_decay", "weight_decay_auto",
    "LR_gamma", "restart_lr", "min_lr",
    # host-side only: affects permutation order, not program shape
    "sampled_segments",
})


def group_signature(config: Dict) -> Tuple:
    """Hashable program signature: everything except VARY_KEYS."""
    return tuple(sorted((k, repr(v)) for k, v in config.items()
                        if k not in VARY_KEYS))


def group_trials(trials: List[Tuple[str, Dict]]) -> List[List]:
    """Partition (trial_id, config) pairs into signature groups,
    preserving launch order inside each group."""
    groups: Dict[Tuple, List] = {}
    order = []
    for t in trials:
        sig = group_signature(t[1])
        if sig not in groups:
            groups[sig] = []
            order.append(sig)
        groups[sig].append(t)
    return [groups[s] for s in order]


def ensemble_eligible(config: Dict, opts) -> bool:
    """Static checks; the runtime resident-budget check happens inside
    run_ensemble_group (which returns None to request fallback)."""
    return (not config.get("transfer_learning")
            and opts.model_path is None
            and opts.dp_devices <= 1
            and opts.profile_dir is None
            and opts.resident != "off")


def run_ensemble_group(group: List[Tuple[str, Dict]], base_opts,
                       model_type: str, exp, scheduler, progress,
                       printer=print):
    """Train every trial in ``group`` as one vmapped ensemble.

    Returns ``[(trial_id, metrics, err), ...]`` like T calls to
    ``_trial_worker``, or ``None`` when the group must fall back to
    per-trial execution (dataset not resident-capable / over budget).
    """
    import jax
    import jax.numpy as jnp

    from mural_tpu.calibrate import calibrate_prob, poisson_calibrate
    from mural_tpu.data.dataset import prepare_dataset
    from mural_tpu.evaluation import Evaluator
    from mural_tpu.genome.fasta import Genome
    from mural_tpu.genome.tracks import TrackSet, read_track_list
    from mural_tpu.models.registry import build_model
    from mural_tpu.train.checkpoint import save_checkpoint
    from mural_tpu.train.early_stopping import EarlyStopping
    from mural_tpu.train.ensemble import (create_ensemble_state,
                                          make_ensemble_epoch_fn,
                                          make_ensemble_eval_fn)
    from mural_tpu.train.loop import (_init_variables,
                                      split_segments_like_torch)
    from mural_tpu.train.optim import (LRSchedule, ReduceLROnPlateau,
                                       auto_weight_decay)
    from mural_tpu.train.resident import (estimate_resident_bytes,
                                          make_resident,
                                          make_resident_epoch_fn,  # noqa: F401 (parity reference)
                                          stack_epoch_rows)
    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    from mural_tpu.utils.printer import get_printer
    from mural_tpu.utils.trials import write_progress_csv

    _enable_compilation_cache()
    T = len(group)
    arch = dict(group[0][1])          # shared program-shaping config
    # same per-experiment overrides launch() applies to serial trials
    opts = dataclasses.replace(base_opts, epochs=exp.epochs,
                               grace_period=exp.grace_period)
    t_start = time.time()

    # --- shared dataset prep (ONE encode for T members) ----------------
    tracks = None
    if opts.bw_paths:
        files, names, radii = read_track_list(opts.bw_paths,
                                              arch["local_radius"])
        if files:
            tracks = TrackSet(files, names, radii)
    bw_distal = (tracks is not None and not opts.without_bw_distal
                 and not opts.seq_only)
    if bw_distal:
        return None     # per-base track channels stream from the host

    genome = Genome.from_fasta(opts.ref_genome)
    ds = prepare_dataset(
        opts.train_data, genome, central_bp=arch["segment_center"],
        local_radius=arch["local_radius"],
        local_order=arch["local_order"],
        distal_radius=arch["distal_radius"],
        distal_order=opts.distal_order, model_type=model_type,
        tracks=tracks, seq_only=opts.seq_only, bw_distal=False)

    if opts.validation_data:
        ds_train = ds
        ds_valid = prepare_dataset(
            opts.validation_data, genome,
            central_bp=arch["segment_center"],
            local_radius=arch["local_radius"],
            local_order=arch["local_order"],
            distal_radius=arch["distal_radius"],
            distal_order=opts.distal_order, model_type=model_type,
            tracks=tracks, seq_only=opts.seq_only, bw_distal=False)
    else:
        # one split for the whole group: with --split_seed this equals
        # the serial trials' split; without it, serial trials would
        # each draw a random seed -- the ensemble shares one draw
        split_seed = (opts.split_seed if opts.split_seed is not None
                      else int(np.random.randint(0, 10000)))
        train_ids, valid_ids = split_segments_like_torch(
            ds.n_segments, opts.valid_ratio, split_seed)
        ds_train = ds.subset_segments(train_ids)
        ds_valid = ds.subset_segments(valid_ids)

    train_size, valid_size = ds_train.n_sites, ds_valid.n_sites
    batch_size = arch["batch_size"]
    if (ds_train.distal_tracks is not None
            or train_size < batch_size):
        return None
    if int(ds_train.y.max(initial=0)) >= opts.n_class:
        raise ValueError(
            f"data contains mutation class "
            f"{int(ds_train.y.max(initial=0))} but --n_class is "
            f"{opts.n_class}")
    seen_valid = np.unique(ds_valid.y)
    if len(seen_valid) < opts.n_class:
        missing = sorted(set(range(opts.n_class)) - set(seen_valid))
        raise ValueError(
            f"validation data never shows mutation class(es) {missing}; "
            f"Dirichlet calibration requires every class observed -- "
            f"lower --n_class, or raise --valid_ratio / change "
            f"--split_seed")

    budget = (opts.resident_max_bytes
              if opts.resident_max_bytes is not None
              else int(os.environ.get("MURAL_RESIDENT_MAX_BYTES",
                                      8 << 30)))
    if (estimate_resident_bytes(ds_train)
            + estimate_resident_bytes(ds_valid)) > budget:
        return None

    # --- per-member setup ----------------------------------------------
    trial_ids = [t[0] for t in group]
    trial_dirs, member_printers, configs, seeds = [], [], [], []
    exp_dir = os.path.join(exp.results_dir, exp.experiment_name)
    for trial_id, cfg in group:
        tdir = os.path.join(exp_dir, trial_id)
        os.makedirs(tdir, exist_ok=True)
        err_path = os.path.join(tdir, "error.txt")
        if os.path.exists(err_path):
            os.remove(err_path)
        import pickle
        with open(os.path.join(tdir, "trial_config.pkl"), "wb") as fh:
            pickle.dump(cfg, fh)
        trial_dirs.append(tdir)
        member_printers.append(get_printer(
            opts.distributed, os.path.join(tdir, "training.log")))
        seeds.append(opts.rng_seed + int(trial_id.rsplit("_", 1)[-1]))

        # config augmentation (train/loop.py:316-347 parity, per member
        # so each checkpoint pickle self-describes its sampled values)
        c = dict(cfg)
        c["n_class"] = opts.n_class
        c["model_no"] = opts.model_no
        c["without_bw_distal"] = opts.without_bw_distal
        c["seq_only"] = opts.seq_only
        c["restart_lr"] = c.get("restart_lr", 1e-4)
        c["min_lr"] = c.get("min_lr", 1e-6)
        c["emb_dims"] = [(x, min(16, int(x ** 0.25)))
                         for x in ds.cat_dims]
        c["n_cont"] = ds.n_cont
        c["weight_decay"] = auto_weight_decay(
            c.get("weight_decay_auto"), batch_size, exp.epochs,
            max(train_size, 1), c.get("weight_decay", 0.0))
        configs.append(c)

    printer(f"trial ensemble: {T} members "
            f"({', '.join(trial_ids)}) vmapped into one program; "
            f"train_size, valid_size: {train_size}, {valid_size}")

    common = {
        "emb_dims": configs[0]["emb_dims"],
        "n_cont": ds.n_cont,
        "n_class": opts.n_class,
        "distal_order": opts.distal_order,
        "in_channels": 4 ** opts.distal_order,
    }
    model = build_model(opts.model_no, arch, common, model_type)

    variables_list = [_init_variables(model, ds, s) for s in seeds]
    schedules = [LRSchedule.build(
        c.get("lr_scheduler", "StepLR"), c["learning_rate"],
        c.get("LR_gamma", 0.9), batch_size, max(train_size, 1),
        c["restart_lr"], c["min_lr"]) for c in configs]
    ens = create_ensemble_state(
        variables_list, arch.get("optim", "Adam"),
        [c["weight_decay"] for c in configs], schedules, seeds,
        device=opts.device)

    res_train = make_resident(ds_train, device=opts.device)
    res_valid = make_resident(ds_valid, device=opts.device)
    if res_train is None or res_valid is None:
        return None
    epoch_fn = make_ensemble_epoch_fn(model, ens, ds_train.distal_width,
                                      bf16=opts.bf16)
    eval_fn = make_ensemble_eval_fn(model, ens, ds_valid.distal_width)
    printer(f"trial ensemble: shared train arena "
            f"{res_train.arena.nbytes / 1e6:.1f} MB, valid arena "
            f"{res_valid.arena.nbytes / 1e6:.1f} MB, one dispatch per "
            f"epoch for all {T} members")

    vrows_np, vmasks_np, v_n_valids = stack_epoch_rows(
        ds_valid, configs[0]["sampled_segments"], batch_size,
        shuffle=False, pad_final=True)
    vrows = jax.device_put(vrows_np, opts.device)
    vmasks = jax.device_put(vmasks_np, opts.device)

    host_rngs = [np.random.default_rng(s) for s in seeds]
    data_local_valid = ds_valid.local_frame()
    chr_pos = ds_valid.position_frame()
    prob_names = [f"prob{i}" for i in range(opts.n_class)]
    kmer_list = [2, 4, 6] if model_type == "indel" else [3, 5, 7]

    from mural_tpu.utils.params import count_parameters
    total_params = count_parameters(variables_list[0]["params"],
                                    printer=member_printers[0])

    # --- per-member bookkeeping -----------------------------------------
    stopped = [False] * T
    errors: List[Optional[Exception]] = [None] * T
    metrics_list: List[Dict] = [{} for _ in range(T)]
    min_loss = [0.0] * T
    min_loss_epoch = [0] * T
    after_min_loss = [0] * T
    iteration = [0] * T
    es_list = [EarlyStopping(patience=opts.grace_period, verbose=True,
                             trace_func=member_printers[t])
               for t in range(T)]
    rops = [ReduceLROnPlateau(configs[t]["learning_rate"])
            if configs[t].get("lr_scheduler") == "ROP" else None
            for t in range(T)]
    from mural_tpu.tune.runner import AFTER_MIN_LOSS_STOP

    def _member_tail(t, epoch, params_host, stats_host, valid_probs,
                     total_loss, valid_total_loss):
        """One member's epoch tail: the calibrate -> evaluate ->
        checkpoint -> report sequence of train/loop.py:613-688."""
        import pandas as pd
        p = member_printers[t]
        valid_y = data_local_valid["mut_type"].to_numpy()
        fdiri_cal, fdiri_nll = calibrate_prob(valid_probs, valid_y,
                                              "FullDiri", printer=p)
        prob_cal = fdiri_cal.predict_proba(valid_probs)
        ev0 = Evaluator(data_local_valid, valid_probs, opts.n_class,
                        printer=p)
        ev1 = Evaluator(data_local_valid, prob_cal, opts.n_class,
                        calibra="FullDiri", printer=p)
        ev0.evaluate_kmer(kmer_list)
        ev1.evaluate_kmer(kmer_list)
        if opts.poisson_calib or model_type == "indel":
            prob_poisson = poisson_calibrate(
                pd.DataFrame(valid_probs, columns=prob_names))
            del prob_poisson      # computed for parity-timing only
        p("Training Loss: ", total_loss / max(train_size, 1))
        p("Validation Loss: ", valid_total_loss / max(valid_size, 1))
        p("Validation Loss (after fdiri_cal): ", fdiri_nll)
        ev0.evaluate_regional_score(valid_size, kmer_list[:2])
        ev1.evaluate_regional_score(valid_size, kmer_list[:2])
        save_path = os.path.join(trial_dirs[t], f"checkpoint_{epoch}",
                                 "model")
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        ev0.evaluate_regional_corr(
            chr_pos, save_valid_preds=opts.save_valid_preds,
            save_path=save_path)
        ev1.evaluate_regional_corr(chr_pos)
        save_checkpoint(save_path, params_host, stats_host, configs[t],
                        fdiri_cal)

        current_loss = valid_total_loss / max(valid_size, 1)
        if epoch == 0 or current_loss < min_loss[t]:
            min_loss[t], min_loss_epoch[t], after_min_loss[t] = \
                current_loss, epoch, 0
        else:
            after_min_loss[t] = epoch - min_loss_epoch[t]
        m = {"loss": current_loss, "fdiri_loss": fdiri_nll,
             "after_min_loss": after_min_loss[t],
             "score": ev0.metrics.get("score", float("nan")),
             "total_params": total_params, "epoch": epoch}
        with open(os.path.join(trial_dirs[t], f"checkpoint_{epoch}",
                               f"epoch_{epoch}_metrics.txt"), "w") as fh:
            for k, v in m.items():
                fh.write(f"{k}: {v}\n")
        metrics_list[t] = m

        iteration[t] += 1
        if progress is not None:
            progress.update(trial_ids[t], "RUNNING", iteration[t], m)
        keep = True
        if m.get("after_min_loss", 0) >= AFTER_MIN_LOSS_STOP:
            keep = False
        if keep and scheduler is not None:
            keep = scheduler.on_report(trial_ids[t], iteration[t], m)
        if not keep:
            p("Trial stopped by scheduler")
            stopped[t] = True

    # one-tail-at-a-time overlap (loop.py:596-611): epoch e's T member
    # tails run on a worker while epoch e+1 trains
    tail = {"thread": None, "error": None}

    def _join_tail():
        if tail["thread"] is not None:
            tail["thread"].join()
            tail["thread"] = None
        if tail["error"] is not None:
            raise tail["error"]

    def _run_tails(epoch, live_members, snapshots, probs_by_member,
                   losses_np, vloss_np):
        try:
            for t in live_members:
                try:
                    _member_tail(t, epoch, *snapshots[t],
                                 probs_by_member[t],
                                 float(losses_np[t]),
                                 float(vloss_np[t]))
                except Exception as e:     # member-local failure
                    errors[t] = e
                    stopped[t] = True
                    import traceback
                    with open(os.path.join(trial_dirs[t], "error.txt"),
                              "w") as fh:
                        fh.write(traceback.format_exc())
        except BaseException as e:
            tail["error"] = e

    for epoch in range(exp.epochs):
        if all(stopped):
            break
        rows_np = np.stack([
            stack_epoch_rows(ds_train, configs[t]["sampled_segments"],
                             batch_size, shuffle=True,
                             rng=host_rngs[t])[0]
            for t in range(T)])
        ens, losses = epoch_fn(
            ens, res_train.arena, res_train.y, res_train.cat,
            res_train.cont, res_train.astart, res_train.neg,
            jax.device_put(rows_np, opts.device))
        logits, vloss = eval_fn(
            ens.flat_params, ens.flat_stats, res_valid.arena,
            res_valid.y, res_valid.cat, res_valid.cont,
            res_valid.astart, res_valid.neg, vrows, vmasks)
        losses_np = np.asarray(losses)
        vloss_np = np.asarray(vloss)
        lg = np.asarray(logits)

        _join_tail()
        live_members = [t for t in range(T) if not stopped[t]]
        snapshots = {t: (ens.member_params_host(t),
                         ens.member_stats_host(t))
                     for t in live_members}
        probs_by_member = {}
        for t in live_members:
            valid_logits = (np.concatenate(
                [lg[t, i, :n] for i, n in enumerate(v_n_valids)])
                if len(v_n_valids) else np.zeros((0, opts.n_class)))
            e = np.exp(valid_logits
                       - valid_logits.max(axis=1, keepdims=True))
            probs_by_member[t] = e / e.sum(axis=1, keepdims=True)

        tail["thread"] = threading.Thread(
            target=_run_tails,
            args=(epoch, live_members, snapshots, probs_by_member,
                  losses_np, vloss_np),
            daemon=True)
        tail["thread"].start()

        # EarlyStopping + ROP act on this epoch's loss immediately (the
        # single-trial loop does the same outside its tail)
        rop_lr_np = np.asarray(ens.rop_lr).copy()
        for t in live_members:
            current_loss = float(vloss_np[t]) / max(valid_size, 1)
            es_list[t](current_loss)
            if es_list[t].early_stop:
                member_printers[t]("Early stopping")
                stopped[t] = True
            if rops[t] is not None:
                rop_lr_np[t] = rops[t].step(current_loss)
        live_np = np.asarray(
            [0.0 if stopped[t] else 1.0 for t in range(T)], np.float32)
        ens = ens.replace(
            live=jax.device_put(jnp.asarray(live_np), opts.device),
            rop_lr=jax.device_put(jnp.asarray(rop_lr_np, np.float32),
                                  opts.device)).next_epoch()
        printer(f"ensemble epoch {epoch}: "
                f"{len(live_members)}/{T} members live, losses "
                + " ".join(f"{float(v) / max(valid_size, 1):.4f}"
                           for v in vloss_np))

    _join_tail()
    results = []
    for t in range(T):
        best_epoch = metrics_list[t].get("epoch", 0) - es_list[t].counter
        member_printers[t](f"Best Epoch: {best_epoch}")
        member_printers[t](
            f"training finished, total time {time.time() - t_start:.1f}s")
        metrics_list[t]["best_epoch"] = best_epoch
        write_progress_csv(trial_dirs[t])
        results.append((trial_ids[t],
                        metrics_list[t] if errors[t] is None else None,
                        errors[t]))
    return results
