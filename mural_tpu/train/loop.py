"""The per-trial training pipeline (ref MuRaL/training.py:45-567).

Flow parity with the reference's ``train(config, args, model_type)``:

dataset build -> segment-level train/valid split (``split_seed``) ->
emb_dims -> model build + torch-style init (or transfer load/freeze) ->
weight_decay_auto -> optimizer/schedule -> epoch loop of jitted train
steps with per-1000-batch timing -> per-epoch validation + FullDirichlet
calibration + k-mer/regional evaluation -> checkpoint triple ->
metrics/early-stopping reporting.

TPU-first differences: batches have static shapes (pad+mask), the LR
schedule is evaluated in-graph, host batching overlaps device compute via
a prefetch thread, and the distal one-hot never materialises on the host.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mural_tpu.data.batcher import segment_pool_batches
from mural_tpu.data.dataset import SiteDataset, prepare_dataset
from mural_tpu.data.prefetch import prefetch
from mural_tpu.calibrate import calibrate_prob, poisson_calibrate
from mural_tpu.evaluation import Evaluator
from mural_tpu.genome.bed import BedFile
from mural_tpu.genome.fasta import Genome
from mural_tpu.genome.tracks import TrackSet, read_track_list
from mural_tpu.models.registry import build_model
from mural_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mural_tpu.train.early_stopping import EarlyStopping
from mural_tpu.train.optim import LRSchedule, auto_weight_decay
from mural_tpu.train.state import create_train_state
from mural_tpu.utils.printer import get_printer


@dataclasses.dataclass
class TrainOptions:
    """Non-searchable options (the reference's argparse ``args``)."""
    train_data: str
    ref_genome: str
    validation_data: Optional[str] = None
    bw_paths: Optional[str] = None
    distal_order: int = 1
    seq_only: bool = False
    without_bw_distal: bool = False
    n_class: int = 4
    model_no: int = 2
    epochs: int = 10
    valid_ratio: float = 0.1
    split_seed: Optional[int] = None
    save_valid_preds: bool = False
    poisson_calib: bool = False
    with_h5: bool = False              # use the on-disk site cache
    h5f_path: Optional[str] = None
    n_h5_files: int = 1                # cache shard count (parallel write)
    grace_period: int = 5
    trial_dir: str = "."
    trial_training_log: Optional[str] = None
    distributed: bool = False          # reference's use_ray
    # transfer learning
    model_path: Optional[str] = None
    train_all: bool = True
    init_fc_with_pretrained: bool = False
    # misc
    rng_seed: int = 0
    device: Optional[object] = None
    dp_devices: int = 1                # data-parallel mesh size
    profile_dir: Optional[str] = None  # capture a jax profiler trace
    bf16: bool = False                 # bf16 activations (f32 opt/BN)
    steps_per_dispatch: Optional[int] = None  # K-scan steps per dispatch
                                       # (None = auto: 8 SNV, 1 INDEL)
    resident: str = "auto"             # device-resident data: auto|on|off
    fused_stem: str = "auto"           # fused one-hot+BN+conv+pool
                                       # training stem: auto|on|off
                                       # (auto resolves OFF -- measured
                                       # slower in-situ than XLA's own
                                       # fusion; 'on' opts in for SNV
                                       # towers, seq-only)
    resident_max_bytes: Optional[int] = None  # auto-mode budget
                                       # (default 8 GiB, or env
                                       # MURAL_RESIDENT_MAX_BYTES)


def split_segments_like_torch(n_segments: int, valid_ratio: float,
                              split_seed: int):
    """Segment-level random split with torch.random_split parity
    (training.py:220-229): randperm under a manually-seeded generator,
    first chunk = train, second = valid, valid indices sorted."""
    valid_size = int(n_segments * valid_ratio)
    train_size = n_segments - valid_size
    # bit-exact torch.randperm stream without torch (utils/torch_rng.py,
    # verified against torch in tests) -- the same seed yields the same
    # split in every environment
    from mural_tpu.utils.torch_rng import torch_randperm
    perm = torch_randperm(n_segments, split_seed).tolist()
    train_ids = np.asarray(perm[:train_size])
    valid_ids = np.sort(np.asarray(perm[train_size:train_size + valid_size]))
    return train_ids, valid_ids


def _variable_shapes(model, ds: SiteDataset):
    """Shape/dtype template of the model variables via ``jax.eval_shape``
    -- no computation is compiled or executed."""
    cat = jax.ShapeDtypeStruct((2, ds.cat.shape[1]), jnp.int32)
    cont = (jax.ShapeDtypeStruct((2, ds.n_cont), jnp.float32)
            if ds.n_cont else None)
    distal = jax.ShapeDtypeStruct(
        (2, ds.distal_width, 4 + ds.n_distal_tracks), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(
        lambda k, c, co, d: model.init(k, c, co, d, False),
        key, cat, cont, distal)


def _init_variables(model, ds: SiteDataset, rng_seed: int):
    """Materialised initial variables (reference init scheme), built from
    shapes only -- avoids compiling the init program, which costs tens of
    seconds per process through a remote-compile service."""
    from mural_tpu.models.init import materialize_variables
    template = _variable_shapes(model, ds)
    return materialize_variables(
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {})}, rng_seed)


def _transfer_mask(params, model_type: str, train_all: bool):
    """0/1 mask tree for transfer freezing (training.py:301-314): only
    the final local/distal FC layers stay trainable unless train_all."""
    if train_all:
        return None
    if model_type == "indel":
        raise ValueError(
            "--train_all is required for INDEL transfer learning; the "
            "INDEL model needs full fine-tuning")
    flat = jax.tree_util.tree_flatten_with_path(params)
    mask_flat = []
    for path, leaf in flat[0]:
        keys = [p.key for p in path]
        trainable = ("local_fc" in keys or
                     ("distal_fc1" in keys and "fc" in keys) or
                     ("distal_fc2" in keys and "fc" in keys))
        mask_flat.append(jnp.asarray(1.0 if trainable else 0.0))
    return jax.tree_util.tree_unflatten(flat[1], mask_flat)


def _reinit_final_fcs(params, rng_seed: int):
    """Re-initialise the final FC layers (training.py:316-321)."""
    import math
    rng = np.random.default_rng(rng_seed + 12345)
    flat = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat[0]:
        keys = [p.key for p in path]
        is_final_fc = ("local_fc" in keys or
                       ("distal_fc1" in keys and "fc" in keys) or
                       ("distal_fc2" in keys and "fc" in keys))
        if is_final_fc and keys[-1] == "kernel":
            fin = leaf.shape[0]
            leaf = jnp.asarray(rng.normal(0, math.sqrt(2.0 / fin),
                                          size=leaf.shape), leaf.dtype)
        elif is_final_fc and keys[-1] == "bias":
            leaf = jnp.zeros_like(leaf)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(flat[1], out)


def train_trial(config: Dict, opts: TrainOptions, model_type: str,
                report_fn: Optional[Callable[[Dict], bool]] = None) -> Dict:
    """Run one training trial.  Returns the final metrics dict.

    ``report_fn(metrics) -> keep_going`` is the scheduler hook (the
    reference's ``tune.report`` / EarlyStopping fork, training.py:534-550);
    returning False stops the trial (ASHA early termination).
    """
    from mural_tpu.utils.pandas_safe import ensure_object_strings
    ensure_object_strings()
    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    _enable_compilation_cache()
    printer = get_printer(opts.distributed, opts.trial_training_log)
    t_start = time.time()

    # --- tracks / continuous features ---------------------------------
    tracks = None
    if opts.bw_paths:
        files, names, radii = read_track_list(opts.bw_paths,
                                              config["local_radius"])
        if files:
            tracks = TrackSet(files, names, radii)
        else:
            printer("Warnings: no bigWig files provided in", opts.bw_paths)
    else:
        printer("NOTE: no bigWig files provided.")

    # per-base distal track channels: on by default when tracks are
    # given, off with --without_bw_distal (ref training.py:258-260 --
    # the reference promises this but its pipeline cannot deliver it)
    bw_distal = (tracks is not None and not opts.without_bw_distal
                 and not opts.seq_only)

    # --- datasets ------------------------------------------------------
    genome = Genome.from_fasta(opts.ref_genome)
    step_t = time.time()
    if opts.with_h5:
        from mural_tpu.data.cache import prepare_dataset_cached
        ds = prepare_dataset_cached(
            opts.train_data, genome, config["segment_center"],
            config["local_radius"], config["local_order"],
            config["distal_radius"], model_type,
            cache_dir=opts.h5f_path, tracks=tracks,
            seq_only=opts.seq_only, printer=printer,
            bw_distal=bw_distal, n_files=opts.n_h5_files)
    else:
        ds = prepare_dataset(
            opts.train_data, genome, central_bp=config["segment_center"],
            local_radius=config["local_radius"],
            local_order=config["local_order"],
            distal_radius=config["distal_radius"],
            distal_order=opts.distal_order, model_type=model_type,
            tracks=tracks, seq_only=opts.seq_only, bw_distal=bw_distal)
    printer("training set preprocess used time:", time.time() - step_t)

    import threading

    def _check_valid_classes(ds_valid_):
        """Fail fast on label/n_class mismatches instead of deep in the
        epoch tail: Dirichlet calibration fits k = classes OBSERVED in
        the validation data (np.unique, matching the reference's
        vendored dirichletcal), so a class that never occurs there
        crashes the Newton solver with an obscure shape error after a
        full epoch."""
        if int(ds_valid_.y.max(initial=0)) >= opts.n_class:
            raise ValueError(
                f"data contains mutation class "
                f"{int(ds_valid_.y.max(initial=0))} but --n_class is "
                f"{opts.n_class}")
        seen_valid = np.unique(ds_valid_.y)
        if len(seen_valid) < opts.n_class:
            missing = sorted(set(range(opts.n_class)) - set(seen_valid))
            raise ValueError(
                f"validation data never shows mutation class(es) "
                f"{missing} (observed "
                f"{sorted(int(c) for c in seen_valid)}); Dirichlet "
                f"calibration requires every class observed -- if the "
                f"data really has fewer classes, lower --n_class; if "
                f"the classes are just rare, raise --valid_ratio or "
                f"try another --split_seed so the validation split "
                f"samples them (the reference's dirichletcal fails the "
                f"same way, only later and less clearly)")

    valid_prep = None
    if opts.validation_data:
        printer("using given validation file:", opts.validation_data)
        ds_train = ds
        # the validation encode runs on a worker thread while the model
        # is built and the epoch-0 programs warm-compile below (the
        # reference's background-preprocess pattern,
        # MuRaL/data/preprocessing.py:340-345); joined before first use
        valid_prep = {"ds": None, "err": None, "start": time.time(),
                      "done_at": None}

        def _prep_valid():
            try:
                valid_prep["ds"] = prepare_dataset(
                    opts.validation_data, genome,
                    central_bp=config["segment_center"],
                    local_radius=config["local_radius"],
                    local_order=config["local_order"],
                    distal_radius=config["distal_radius"],
                    distal_order=opts.distal_order,
                    model_type=model_type, tracks=tracks,
                    seq_only=opts.seq_only, bw_distal=bw_distal)
            except BaseException as e:
                valid_prep["err"] = e
            valid_prep["done_at"] = time.time()

        valid_prep["thread"] = threading.Thread(target=_prep_valid,
                                                daemon=True)
        valid_prep["thread"].start()
        ds_valid = None
    else:
        split_seed = (opts.split_seed if opts.split_seed is not None
                      else np.random.randint(0, 10000))
        train_ids, valid_ids = split_segments_like_torch(
            ds.n_segments, opts.valid_ratio, split_seed)
        ds_train = ds.subset_segments(train_ids)
        ds_valid = ds.subset_segments(valid_ids)

    def _join_valid_prep():
        nonlocal ds_valid
        if valid_prep is None:
            return
        valid_prep["thread"].join()
        if valid_prep["err"] is not None:
            raise valid_prep["err"]
        ds_valid = valid_prep["ds"]
        printer("validation preprocess ran on a worker "
                f"({valid_prep['done_at'] - valid_prep['start']:.1f}s, "
                "overlapped with model build/compile warm-up)")

    train_size = ds_train.n_sites
    if int(ds_train.y.max(initial=0)) >= opts.n_class:
        raise ValueError(
            f"data contains mutation class "
            f"{int(ds_train.y.max(initial=0))} but --n_class is "
            f"{opts.n_class}")
    if ds_valid is not None:
        _check_valid_classes(ds_valid)
        printer("train_size, valid_size:", train_size, ds_valid.n_sites)

    # --- config augmentation (training.py:170-177,246-255) ------------
    config = dict(config)
    config["n_class"] = opts.n_class
    config["model_no"] = opts.model_no
    config["without_bw_distal"] = opts.without_bw_distal
    config["seq_only"] = opts.seq_only
    config["restart_lr"] = config.get("restart_lr", 1e-4)
    config["min_lr"] = config.get("min_lr", 1e-6)
    if not config.get("transfer_learning"):
        cat_dims = ds.cat_dims
        config["emb_dims"] = [(x, min(16, int(x ** 0.25)))
                              for x in cat_dims]

    n_cont = ds.n_cont
    if (config.get("transfer_learning")
            and config.get("n_cont") is not None
            and config["n_cont"] != n_cont):
        raise ValueError(
            f"pretrained checkpoint used n_cont={config['n_cont']} track "
            f"feature(s) but this run provides {n_cont} -- pass the same "
            "--bw_paths track list used for pretraining")
    config["n_cont"] = n_cont    # predict/transfer rehydrate from this
    # in_channels = 4**distal_order + n_cont with distal track channels
    # (training.py:258-260), else 4**distal_order
    in_channels = 4 ** opts.distal_order + (n_cont if bw_distal else 0)
    common = {
        "emb_dims": config["emb_dims"],
        "n_cont": n_cont,
        "n_class": opts.n_class,
        "distal_order": opts.distal_order,
        "in_channels": in_channels,
    }
    model = build_model(opts.model_no, config, common, model_type)

    # fused training stem (ops/fused_train_stem): each distal tower's
    # BN->conv1->maxpool runs as one Pallas table kernel on raw codes.
    # Mathematically the unfused composition (histogram-exact BN stats,
    # identical parameter gradients) and fully tested, but measured
    # SLOWER in-situ on v5e at B=2048 (f32 3.65 vs 3.05 ms/step, bf16
    # 3.14 vs 1.89): the lane-padded (B*P, 128) window-code array plus
    # the in-kernel one-hot rebuild cost more HBM/VPU than the pool
    # complex they replace (docs/design.md records the three kernel
    # designs tried).  'auto' therefore resolves to OFF; the op stays
    # available opt-in for hardware where the tradeoff flips.
    use_fused_stem = (opts.fused_stem == "on" and model_type == "snv"
                      and opts.model_no in (1, 2, 3)
                      and in_channels == 4 and not bw_distal
                      and opts.distal_order == 1)
    if use_fused_stem:
        printer("fused train stem: on (one-hot+BN+conv+pool as one "
                "table kernel)")

    variables = _init_variables(model, ds, opts.rng_seed)
    trainable_mask = None
    if config.get("transfer_learning"):
        config.setdefault("train_all", opts.train_all)
        config.setdefault("init_fc_with_pretrained",
                          opts.init_fc_with_pretrained)
        template = {"params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {})}
        restored = jax.device_put(
            load_checkpoint(opts.model_path, template), opts.device)
        variables = dict(variables)
        variables["params"] = restored["params"]
        variables["batch_stats"] = restored["batch_stats"]
        trainable_mask = _transfer_mask(variables["params"], model_type,
                                        config.get("train_all", True))
        if not config.get("init_fc_with_pretrained", False):
            if model_type == "indel":
                raise ValueError(
                    "--init_fc_with_pretrained is required for INDEL "
                    "transfer learning")
            variables["params"] = _reinit_final_fcs(variables["params"],
                                                    opts.rng_seed)
    else:
        # _init_variables already materialised the reference's init
        # scheme (materialize_variables); pin on device once
        variables = jax.device_put(dict(variables), opts.device)

    from mural_tpu.utils.params import count_parameters
    total_params = count_parameters(variables["params"], printer=printer)

    # --- optimizer / schedule -----------------------------------------
    config["weight_decay"] = auto_weight_decay(
        config.get("weight_decay_auto"), config["batch_size"],
        opts.epochs, max(train_size, 1), config.get("weight_decay", 0.0))
    printer("weight_decay:", config["weight_decay"])

    schedule = LRSchedule.build(
        config.get("lr_scheduler", "StepLR"), config["learning_rate"],
        config.get("LR_gamma", 0.9), config["batch_size"],
        max(train_size, 1), config["restart_lr"], config["min_lr"])
    # the state is kept flat-packed for the whole run: the model family
    # is ~480 tiny parameter leaves, and dispatching pytree-shaped steps
    # pays a per-leaf runtime cost that exceeds the step's compute
    # (train/packed.py); unpacked host views are taken at epoch
    # boundaries for checkpoint/eval
    from mural_tpu.train.packed import (make_packed_eval_step,
                                        make_packed_train_step,
                                        make_packed_train_step_scan,
                                        pack_state)
    state = pack_state(create_train_state(
        model, variables, config.get("optim", "Adam"),
        config["weight_decay"], schedule, trainable_mask=trainable_mask))
    train_step = make_packed_train_step(model, state, bf16=opts.bf16,
                                        fused_stem=use_fused_stem)
    # K steps per dispatch amortise the fixed per-dispatch cost; the
    # leftover (< K) batches at the epoch end run the single step.
    # Auto default: 8 for the millisecond-scale SNV step (dispatch-
    # bound), 1 for the INDEL U-Net (a ~20-35 ms step gains nothing and
    # the scanned program's buffer pressure measurably hurts bf16).
    # Disabled while profiling (per-batch timing stays legible).
    if opts.steps_per_dispatch is None:
        k_scan = 8 if model_type == "snv" else 1
    else:
        k_scan = max(1, opts.steps_per_dispatch)
    if opts.profile_dir is not None:
        k_scan = 1
    train_step_scan = (make_packed_train_step_scan(
        model, state, bf16=opts.bf16, fused_stem=use_fused_stem)
        if k_scan > 1 else None)
    eval_step = make_packed_eval_step(model, state,
                                      fused_stem=use_fused_stem)
    base_rng = jax.random.key(opts.rng_seed)

    # -- data-parallel mesh (extension over the single-device reference,
    # SURVEY.md 2.3): params replicate, batches shard on the 'data' axis,
    # XLA derives the gradient all-reduce over ICI from the shardings.
    # Built before the resident block so resident epochs can run
    # mesh-sharded too (one dispatch per epoch per mesh).
    mesh = None
    batch_sharding_ = None
    stacked_sharding_ = None
    if opts.dp_devices > 1:
        from mural_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated,
                                             stacked_batch_sharding)
        mesh = make_mesh(opts.dp_devices)
        batch_sharding_ = batch_sharding(mesh)
        stacked_sharding_ = stacked_batch_sharding(mesh)
        state = jax.device_put(state, replicated(mesh))
        base_rng = jax.device_put(base_rng, replicated(mesh))
        if config["batch_size"] % opts.dp_devices:
            raise ValueError(
                f"batch_size {config['batch_size']} must be divisible "
                f"by dp_devices {opts.dp_devices}")
        printer(f"data-parallel training over {opts.dp_devices} devices")

    # -- device-resident data path (round-3): the whole epoch as one
    # dispatch over resident arrays; the host only computes the segment-
    # pool permutation.  Removes the host-feed gap (e2e 48k vs 713k+
    # device windows/s in round 2).  Falls back to the host-fed prefetch
    # loop for per-base track channels or data over budget.  Composes
    # with --dp_devices: resident arrays replicate over the mesh, each
    # epoch's row array shards on its batch axis.
    use_resident = False
    warm = None
    if (opts.resident != "off"
            and ds_train.distal_tracks is None
            and ds_train.n_sites >= config["batch_size"]):
        from mural_tpu.train.resident import (estimate_resident_bytes,
                                              make_resident,
                                              make_resident_epoch_fn,
                                              make_resident_eval_fn,
                                              stack_epoch_rows)
        budget = (opts.resident_max_bytes
                  if opts.resident_max_bytes is not None
                  else int(os.environ.get("MURAL_RESIDENT_MAX_BYTES",
                                          8 << 30)))
        # validation may still be preprocessing on its worker; its
        # device footprint is bounded by the training set's in every
        # reference workflow, so budget on 2x the train estimate
        est = estimate_resident_bytes(ds_train) * (
            2 if ds_valid is None else 1)
        if ds_valid is not None:
            est += estimate_resident_bytes(ds_valid)
        # resident arrays replicate over a DP mesh; epoch row arrays
        # shard on their batch axis (stacked_sharding_'s P(None, 'data'))
        # ('replicated' is in scope exactly when mesh is not None)
        res_device = opts.device if mesh is None else replicated(mesh)
        rows_device = stacked_sharding_ if mesh is not None else opts.device
        if opts.resident == "on" or est <= budget:
            res_train = make_resident(ds_train, device=res_device)
            use_resident = res_train is not None
        if use_resident:
            resident_epoch = make_resident_epoch_fn(
                model, state, ds_train.distal_width, bf16=opts.bf16,
                fused_stem=use_fused_stem, mesh=mesh)

            # ---- epoch-0 compile warm-up (VERDICT r2 item 9) --------
            # AOT-compile the epoch program NOW (lower().compile()
            # seeds the jit dispatch cache in this JAX: first real call
            # does zero new XLA compiles, only a ~us re-trace),
            # overlapping the validation worker's preprocessing.  No
            # device execution happens -- an earlier version dispatched
            # a discarded zero-rows epoch, paying up to a full epoch of
            # device time when validation preprocessing finished first.
            n_steps0 = train_size // config["batch_size"]

            def _warm():
                try:
                    zero_rows = jax.device_put(
                        np.zeros((n_steps0, config["batch_size"]),
                                 np.int32), rows_device)
                    resident_epoch.lower(
                        state, res_train.arena, res_train.y,
                        res_train.cat, res_train.cont, res_train.astart,
                        res_train.neg, zero_rows, base_rng).compile()
                except Exception as e:  # real epoch 0 will surface it
                    warm["err"] = e

            if valid_prep is not None:
                warm = {"t0": time.time(), "err": None}
                warm["thread"] = threading.Thread(target=_warm,
                                                  daemon=True)
                warm["thread"].start()

    _join_valid_prep()
    if valid_prep is not None:
        _check_valid_classes(ds_valid)
        printer("train_size, valid_size:", train_size, ds_valid.n_sites)
    valid_size = ds_valid.n_sites

    if use_resident and opts.resident != "on" and valid_prep is not None:
        # the pre-join budget gate could only assume valid <= train
        # (2x the train estimate); recheck with the real validation
        # dataset before uploading -- a validation file much larger
        # than the training set must fall back to the host-fed path
        # instead of OOMing the device mid-trial
        est_now = (estimate_resident_bytes(ds_train)
                   + estimate_resident_bytes(ds_valid))
        if est_now > budget:
            printer(f"device-resident data: validation set exceeds the "
                    f"budget ({est_now / 2**30:.2f} GiB > "
                    f"{budget / 2**30:.2f} GiB); using host-fed batches")
            use_resident = False
    if use_resident:
        res_valid = make_resident(ds_valid, device=res_device)
        use_resident = res_valid is not None
    if use_resident:
        resident_eval = make_resident_eval_fn(
            model, state, ds_valid.distal_width,
            fused_stem=use_fused_stem, mesh=mesh)
        # validation order is deterministic (no shuffle): compute
        # and upload the row/mask arrays once per trial
        vrows_np, vmasks_np, v_n_valids = stack_epoch_rows(
            ds_valid, config["sampled_segments"],
            config["batch_size"], shuffle=False, pad_final=True)
        vrows_dev = jax.device_put(vrows_np, rows_device)
        vmasks_dev = jax.device_put(vmasks_np, rows_device)
        printer(f"device-resident data: train arena "
                f"{res_train.arena.nbytes / 1e6:.1f} MB, "
                f"valid arena {res_valid.arena.nbytes / 1e6:.1f} MB, "
                f"one dispatch per epoch"
                + (f" over {opts.dp_devices} devices"
                   if mesh is not None else ""))
    if warm is not None:
        warm["thread"].join()
        if warm["err"] is not None:
            printer(f"epoch-0 warm-compile failed "
                    f"({type(warm['err']).__name__}: {warm['err']}); "
                    f"epoch 0 will compile inline")
        else:
            printer(f"epoch-0 train program warm-compiled in "
                    f"{time.time() - warm['t0']:.1f}s (overlapped with "
                    f"validation preprocess)")

    prob_names = [f"prob{i}" for i in range(opts.n_class)]
    data_local_valid = ds_valid.local_frame()

    es = EarlyStopping(patience=opts.grace_period, verbose=True,
                       trace_func=printer)
    rop = None
    if config.get("lr_scheduler") == "ROP":
        from mural_tpu.train.optim import ReduceLROnPlateau
        rop = ReduceLROnPlateau(config["learning_rate"])
    min_loss, min_loss_epoch, after_min_loss = 0.0, 0, 0
    metrics: Dict = {}
    host_rng = np.random.default_rng(opts.rng_seed)

    # ---- overlapped epoch tail ----------------------------------------
    # Calibration fit + Evaluators + checkpoint write depend only on this
    # epoch's validation logits and a host snapshot of the params, so
    # they run on a worker thread while the next epoch trains
    # (VERDICT round-1 item 6).  One tail at a time: the previous tail is
    # joined before the next one starts, keeping logs/metrics ordered.
    import threading

    tail: Dict = {"thread": None, "stop": False, "error": None}

    def _join_tail():
        if tail["thread"] is not None:
            tail["thread"].join()
            tail["thread"] = None
        if tail["error"] is not None:
            raise tail["error"]

    def _run_tail(epoch, params_host_fn, stats_host_fn, valid_probs_fn,
                  total_loss, valid_total_loss):
        nonlocal metrics, min_loss, min_loss_epoch, after_min_loss
        try:
            import pandas as pd
            # logits fetch + softmax run HERE, overlapped with the next
            # epoch's device work: on a 1-core host every ms of main-
            # thread post-sync work lands on the epoch critical path
            valid_probs = valid_probs_fn()
            valid_y = data_local_valid["mut_type"].to_numpy()
            fdiri_cal, fdiri_nll = calibrate_prob(
                valid_probs, valid_y, "FullDiri", printer=printer)
            prob_cal = fdiri_cal.predict_proba(valid_probs)
            if opts.poisson_calib or model_type == "indel":
                prob_poisson = poisson_calibrate(
                    pd.DataFrame(valid_probs, columns=prob_names))

            ev0 = Evaluator(data_local_valid, valid_probs, opts.n_class,
                            printer=printer)
            ev1 = Evaluator(data_local_valid, prob_cal, opts.n_class,
                            calibra="FullDiri", printer=printer)
            kmer_list = ([2, 4, 6] if model_type == "indel"
                         else [3, 5, 7])
            ev0.evaluate_kmer(kmer_list)
            ev1.evaluate_kmer(kmer_list)
            if opts.poisson_calib:
                evp = Evaluator(data_local_valid,
                                prob_poisson.to_numpy(), opts.n_class,
                                calibra="Poisson", printer=printer)
                evp.evaluate_kmer(kmer_list)

            printer("Training Loss: ", total_loss / max(train_size, 1))
            printer("Validation Loss: ",
                    valid_total_loss / max(valid_size, 1))
            printer("Validation Loss (after fdiri_cal): ", fdiri_nll)

            ev0.evaluate_regional_score(valid_size, kmer_list[:2])
            ev1.evaluate_regional_score(valid_size, kmer_list[:2])
            if opts.poisson_calib:
                evp.evaluate_regional_score(valid_size, kmer_list[:2])

            chr_pos = ds_valid.position_frame()
            save_path = os.path.join(opts.trial_dir,
                                     f"checkpoint_{epoch}", "model")
            os.makedirs(os.path.dirname(save_path), exist_ok=True)
            ev0.evaluate_regional_corr(
                chr_pos, save_valid_preds=opts.save_valid_preds,
                save_path=save_path)
            ev1.evaluate_regional_corr(chr_pos)
            if opts.poisson_calib:
                evp.evaluate_regional_corr(chr_pos)

            save_checkpoint(save_path, params_host_fn(),
                            stats_host_fn(), config,
                            fdiri_cal)

            current_loss = valid_total_loss / max(valid_size, 1)
            if epoch == 0 or current_loss < min_loss:
                min_loss, min_loss_epoch, after_min_loss = \
                    current_loss, epoch, 0
            else:
                after_min_loss = epoch - min_loss_epoch

            m = {
                "loss": current_loss,
                "fdiri_loss": fdiri_nll,
                "after_min_loss": after_min_loss,
                "score": ev0.metrics.get("score", float("nan")),
                "total_params": total_params,
                "epoch": epoch,
            }
            report_path = os.path.join(
                opts.trial_dir, f"checkpoint_{epoch}",
                f"epoch_{epoch}_metrics.txt")
            with open(report_path, "w") as fh:
                for k, v in m.items():
                    fh.write(f"{k}: {v}\n")
            metrics = m
            if report_fn is not None and report_fn(m) is False:
                tail["stop"] = True
                printer("Trial stopped by scheduler")
        except BaseException as e:   # re-raised on join
            tail["error"] = e
            tail["stop"] = True

    # epoch-0 permutation: later epochs' permutations are computed and
    # uploaded while the device runs the current epoch (see below), so
    # the host's only critical-path work per epoch is the dispatches
    if use_resident:
        _rows_np0, _, _ = stack_epoch_rows(
            ds_train, config["sampled_segments"], config["batch_size"],
            shuffle=True, rng=host_rng)
        pending_rows = (jax.device_put(_rows_np0, rows_device),
                        _rows_np0.shape[0])

    for epoch in range(opts.epochs):
        if tail["stop"]:
            # the overlapped tail already reported a scheduler stop:
            # don't dispatch another epoch (the resident path commits a
            # whole epoch per dispatch, so this is its only chance to
            # honor the stop before paying train+valid device time)
            break
        epoch_t = time.time()
        profiling = (opts.profile_dir is not None and epoch == 0)
        if profiling:
            jax.profiler.start_trace(opts.profile_dir)

        if use_resident:
            rows_dev_cur, batch_count = pending_rows
            state, total_loss_dev, _lr = resident_epoch(
                state, res_train.arena, res_train.y, res_train.cat,
                res_train.cont, res_train.astart, res_train.neg,
                rows_dev_cur, base_rng)
            # dispatch validation NOW (async -- XLA runs it after the
            # epoch program; the host never blocks between the two) and
            # take device-side snapshots of the new state: the epoch
            # tail fetches the copies while the NEXT epoch's donated
            # steps invalidate the live buffers (VERDICT r3 item 7 --
            # the e2e-vs-device gap was these serialized syncs)
            logits_stacked, vloss_dev = resident_eval(
                state.flat_params, state.flat_stats,
                res_valid.arena, res_valid.y, res_valid.cat,
                res_valid.cont, res_valid.astart, res_valid.neg,
                vrows_dev, vmasks_dev)
            snap_p = state.flat_params + 0    # fresh device buffers,
            snap_s = state.flat_stats + 0     # immune to donation
            # next epoch's permutation + upload overlap the device work
            if epoch + 1 < opts.epochs:
                _rows_np, _, _ = stack_epoch_rows(
                    ds_train, config["sampled_segments"],
                    config["batch_size"], shuffle=True, rng=host_rng)
                pending_rows = (jax.device_put(_rows_np, rows_device),
                                _rows_np.shape[0])
        else:
            # device-side loss accumulator: keeping the scalar on device
            # avoids a host sync per step (each sync costs a full round
            # trip through the TPU transport and dominated epoch time)
            total_loss_dev = jnp.zeros((), jnp.float32)
            batch_count = 0
            next_progress = 1000
            fetch_t = 0.0
            train_t = 0.0
            t0 = time.time()

            batches = segment_pool_batches(
                ds_train, config["sampled_segments"],
                config["batch_size"], shuffle=True, rng=host_rng)
            if k_scan > 1:
                from mural_tpu.data.prefetch import prefetch_stacked
                batch_iter = prefetch_stacked(
                    batches, k_scan, size=2, device=opts.device,
                    sharding=stacked_sharding_,
                    single_sharding=batch_sharding_)
            else:
                batch_iter = prefetch(batches, size=2, device=opts.device,
                                      sharding=batch_sharding_)
            for db in batch_iter:
                if tail["stop"]:      # scheduler stopped us mid-overlap
                    break
                fetch_t += time.time() - t0
                t1 = time.time()
                if hasattr(db, "k"):     # K-stacked group -> scan step
                    state, losses, lr = train_step_scan(
                        state, db.y, db.cat, db.cont, db.distal, db.mask,
                        base_rng, db.distal_tracks)
                    total_loss_dev = total_loss_dev + jnp.sum(losses)
                    batch_count += db.k
                else:
                    state, loss, lr = train_step(state, db.y, db.cat,
                                                 db.cont, db.distal,
                                                 db.mask, base_rng,
                                                 db.distal_tracks)
                    total_loss_dev = total_loss_dev + loss
                    batch_count += 1
                train_t += time.time() - t1
                if batch_count >= next_progress:
                    printer(f"Batch {batch_count}: fetch {fetch_t:.1f}s, "
                            f"train {train_t:.1f}s (last 1000, async)")
                    fetch_t = train_t = 0.0
                    next_progress += 1000
                t0 = time.time()

        if profiling:
            jax.block_until_ready(total_loss_dev)
            jax.profiler.stop_trace()
            printer("profiler trace written to", opts.profile_dir)
        total_loss = float(total_loss_dev)
        t_train_done = time.time()
        printer("optimizer learning rate:", float(state.lr()))

        # ---- validation (async: device arrays collected, one sync) ---
        if use_resident:
            # already dispatched right after the epoch program above.
            # The device fetch stays on the MAIN thread (free once the
            # vloss sync has run; a device fetch on the tail thread
            # races the next epoch's compile and segfaults the axon
            # transport); only the pure-numpy concat + softmax defer to
            # the overlapped tail.
            valid_total_loss = float(vloss_dev)
            lg_host = np.asarray(logits_stacked)

            def valid_probs_fn(lg=lg_host, nv=tuple(v_n_valids)):
                valid_logits = (np.concatenate(
                    [lg[i, :n] for i, n in enumerate(nv)])
                    if nv else np.zeros((0, opts.n_class)))
                e = np.exp(valid_logits
                           - valid_logits.max(axis=1, keepdims=True))
                return e / e.sum(axis=1, keepdims=True)
        else:
            logits_parts: List = []
            vloss_dev = jnp.zeros((), jnp.float32)
            vbatches = segment_pool_batches(
                ds_valid, config["sampled_segments"],
                config["batch_size"], shuffle=False, pad_final=True)
            n_valids = []
            for db in prefetch(vbatches, size=2, device=opts.device,
                               sharding=batch_sharding_):
                logits, vloss = eval_step(state.flat_params,
                                          state.flat_stats,
                                          db.y, db.cat, db.cont,
                                          db.distal, db.mask,
                                          db.distal_tracks)
                vloss_dev = vloss_dev + vloss
                logits_parts.append(logits)
                n_valids.append(db.n_valid)
            valid_total_loss = float(vloss_dev)
            lg_parts = tuple(np.asarray(lg) for lg in logits_parts)

            def valid_probs_fn(lp=lg_parts, nv=tuple(n_valids)):
                valid_logits = (np.concatenate(
                    [lg[:n] for lg, n in zip(lp, nv)])
                    if lp else np.zeros((0, opts.n_class)))
                e = np.exp(valid_logits
                           - valid_logits.max(axis=1, keepdims=True))
                return e / e.sum(axis=1, keepdims=True)
        t_valid_done = time.time()

        # previous epoch's tail must finish before this epoch's starts
        _join_tail()
        if tail["stop"]:
            break

        # host snapshot BEFORE the next epoch's donated train steps
        # invalidate the buffers.  Resident path: the snapshots are
        # device-side copies taken at dispatch time, so the tail thread
        # pays the device->host transfer off the critical path while
        # the next epoch trains; host-fed path: one transfer each here.
        if use_resident:
            from mural_tpu.train.packed import unpack_tree_np

            def params_host_fn(sp=snap_p, spec=state.p_spec):
                return unpack_tree_np(np.asarray(sp), spec)

            def stats_host_fn(ss=snap_s, spec=state.s_spec):
                return unpack_tree_np(np.asarray(ss), spec)
        else:
            _ph = state.params_host()
            _sh = state.batch_stats_host()
            params_host_fn = (lambda ph=_ph: ph)
            stats_host_fn = (lambda sh=_sh: sh)
        t_fetch_done = time.time()

        current_loss = valid_total_loss / max(valid_size, 1)
        tail["thread"] = threading.Thread(
            target=_run_tail,
            args=(epoch, params_host_fn, stats_host_fn, valid_probs_fn,
                  total_loss, valid_total_loss),
            daemon=True)
        tail["thread"].start()

        es(current_loss)
        if es.early_stop:
            printer("Early stopping")
            break

        # ROP epoch update (training.py:553-554)
        if rop is not None:
            state = state.replace(
                rop_lr=jnp.asarray(rop.step(current_loss), jnp.float32))

        state = state.next_epoch()
        now = time.time()
        printer(f"Epoch {epoch} used time: {now - epoch_t:.1f}s "
                f"(train {t_train_done - epoch_t:.1f}s, "
                f"valid {t_valid_done - t_train_done:.1f}s, "
                f"fetch {t_fetch_done - t_valid_done:.1f}s; "
                f"calib/eval/ckpt overlap the next epoch)")
        sys.stdout.flush()

    _join_tail()
    best_epoch = metrics.get("epoch", 0) - es.counter
    printer(f"Best Epoch: {best_epoch}")
    printer(f"training finished, total time "
            f"{time.time() - t_start:.1f}s")
    metrics["best_epoch"] = best_epoch
    from mural_tpu.utils.trials import write_progress_csv
    write_progress_csv(opts.trial_dir)
    return metrics
