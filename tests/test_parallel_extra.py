"""Trial packing across devices and mesh-sharded genome-wide predict."""
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


@needs8
def test_parallel_trials_across_devices(tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment
    from mural_tpu.tune.space import Choice

    space = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=Choice([8, 16]), local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    exp = ExperimentOptions(experiment_name="par",
                            results_dir=str(tmp_path), n_trials=2,
                            epochs=1, n_parallel=2, seed=3)
    best = run_experiment(space, opts, "snv", exp,
                          printer=lambda *a: None)
    assert len(best) == 2


@needs8
def test_parallel_trials_match_serial(tiny_genome, tiny_bed, tmp_path):
    """Concurrent trial packing must produce the same per-trial results
    as the serial mode (VERDICT round-1 item 8).  Same experiment seed
    -> same trial ids + sampled configs; CPU devices are identical, so
    the final losses must match to float tolerance.

    Caveat (documented): concurrent trials share one Python process, so
    host-side encoding/eval tails contend on the GIL -- packing helps
    only when trials are device-bound (native gathers release the GIL).
    """
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment
    from mural_tpu.tune.space import Choice

    space = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=Choice([8, 16]), local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    losses = {}
    for n_par in (1, 2):
        exp = ExperimentOptions(experiment_name=f"eq{n_par}",
                                results_dir=str(tmp_path), n_trials=2,
                                epochs=2, n_parallel=n_par, seed=11)
        best = run_experiment(space, opts, "snv", exp,
                              printer=lambda *a: None)
        # map trial id -> loss (paths contain the trial directory)
        losses[n_par] = sorted(
            (path.split("/")[-3], loss) for path, loss in best)
    ids1 = [t for t, _ in losses[1]]
    ids2 = [t for t, _ in losses[2]]
    assert ids1 == ids2
    l1 = np.asarray([l for _, l in losses[1]])
    l2 = np.asarray([l for _, l in losses[2]])
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


@needs8
def test_fused_inference_sharded(tiny_genome, tiny_bed, tmp_path):
    """--fused_inference must thread into the sharded (n_devices>1)
    predict path and agree with the unsharded fused run (ADVICE round-1:
    it was silently ignored)."""
    import pandas as pd

    from mural_tpu.predict.pipeline import PredictOptions, run_predict
    from mural_tpu.train.loop import TrainOptions, train_trial

    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False,
        model_no=2)
    topts = TrainOptions(train_data=tiny_bed,
                         ref_genome=tiny_genome["path"], n_class=4,
                         model_no=2, epochs=1, valid_ratio=0.25,
                         split_seed=1, trial_dir=str(tmp_path / "t"))
    train_trial(config, topts, "snv")
    cdir = tmp_path / "t" / "checkpoint_0"

    outs = {}
    for n_dev in (1, 8):
        out = str(tmp_path / f"fp{n_dev}.tsv")
        popts = PredictOptions(
            test_data=tiny_bed, ref_genome=tiny_genome["path"],
            model_path=str(cdir / "model"),
            model_config_path=str(cdir / "model.config.pkl"),
            pred_file=out, pred_batch_size=64, n_devices=n_dev,
            fused_inference=True)
        run_predict(popts, "snv", printer=lambda *a: None)
        outs[n_dev] = pd.read_csv(out, sep="\t")
    p1 = outs[1][[f"prob{i}" for i in range(4)]].to_numpy()
    p8 = outs[8][[f"prob{i}" for i in range(4)]].to_numpy()
    assert len(p1) == len(p8) and len(p1) > 0
    assert np.allclose(p1, p8, atol=2e-4)


@needs8
def test_genome_wide_sharded(tiny_genome, tiny_bed, tmp_path):
    from mural_tpu.train.loop import TrainOptions, train_trial
    from mural_tpu.predict.genome_wide import (GenomePredictOptions,
                                               run_genome_predict)
    import pandas as pd

    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, epochs=1, valid_ratio=0.25,
                        split_seed=1, trial_dir=str(tmp_path / "t"))
    train_trial(config, opts, "snv")
    cdir = str(tmp_path / "t" / "checkpoint_0")

    outs = {}
    for n_dev in (1, 8):
        out = str(tmp_path / f"gp{n_dev}.tsv")
        gopts = GenomePredictOptions(
            ref_genome=tiny_genome["path"],
            model_path=os.path.join(cdir, "model"),
            model_config_path=os.path.join(cdir, "model.config.pkl"),
            pred_file=out, focal_base="A", chroms=["chrM"],
            batch_size=64, flush_batches=2, n_devices=n_dev)
        run_genome_predict(gopts, "snv", printer=lambda *a: None)
        outs[n_dev] = pd.read_csv(out, sep="\t")
    assert len(outs[1]) == len(outs[8])
    p1 = outs[1][[f"prob{i}" for i in range(4)]].to_numpy()
    p8 = outs[8][[f"prob{i}" for i in range(4)]].to_numpy()
    assert np.allclose(p1, p8, atol=2e-4)


def test_process_executor_matches_thread(tiny_genome, tiny_bed,
                                         tmp_path):
    """The spawned-process trial executor (--trial_executor process;
    dodges GIL contention from pandas eval tails on many-core hosts)
    must produce the same per-trial results as the threaded executor:
    same seeds -> same trial ids, sampled configs and final losses."""
    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import ExperimentOptions, run_experiment
    from mural_tpu.tune.space import Choice

    space = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=Choice([8, 16]), local_hidden2_size=4,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, valid_ratio=0.25, split_seed=1)
    losses = {}
    for mode in ("thread", "process"):
        exp = ExperimentOptions(experiment_name=f"ex_{mode}",
                                results_dir=str(tmp_path), n_trials=2,
                                epochs=1, n_parallel=2, seed=11,
                                use_scheduler=True,
                                trial_executor=mode)
        best = run_experiment(space, opts, "snv", exp,
                              printer=lambda *a: None)
        losses[mode] = sorted(
            (path.split("/")[-3], loss) for path, loss in best)
    assert [t for t, _ in losses["thread"]] == \
           [t for t, _ in losses["process"]]
    lt = np.asarray([l for _, l in losses["thread"]])
    lp = np.asarray([l for _, l in losses["process"]])
    np.testing.assert_allclose(lt, lp, rtol=1e-5)


def test_process_executor_no_deadlock_on_parent_error(tiny_genome,
                                                      tiny_bed,
                                                      tmp_path):
    """A parent-side exception in the verdict loop (progress table or
    scheduler raising) must terminate the child trial process instead
    of leaving it blocked on conn.recv() with the launch thread stuck
    in join() -- the finally-cleanup contract of
    _run_trial_in_process."""
    import threading

    from mural_tpu.train.loop import TrainOptions
    from mural_tpu.tune.runner import _run_trial_in_process

    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=60, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=1e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)
    opts = TrainOptions(train_data=tiny_bed,
                        ref_genome=tiny_genome["path"], n_class=4,
                        model_no=2, epochs=3, valid_ratio=0.25,
                        split_seed=1, trial_dir=str(tmp_path / "t"))

    class Boom:
        def update(self, *a, **k):
            raise RuntimeError("progress table exploded")

    result = {}

    def run():
        try:
            _run_trial_in_process("Train_boom_00000", config, opts,
                                  "snv", None, 0, 1, Boom())
        except RuntimeError as e:
            result["err"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=420)
    assert not th.is_alive(), "parent verdict loop deadlocked"
    assert "exploded" in str(result.get("err"))
