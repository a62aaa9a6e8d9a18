"""Mesh-parallel paths on the virtual 8-device CPU platform."""
import os

import jax
import numpy as np
import pytest

from mural_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


def test_mesh_helpers():
    n = min(len(jax.devices()), 8)
    mesh = make_mesh(n)
    assert len(mesh.devices.flat) == n
    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_training_matches_single_device(tiny_genome, tiny_bed,
                                           tmp_path):
    """Data-parallel training over the 8-device mesh must produce the
    same losses as single-device training (same data, same seeds):
    replication + batch sharding is semantically a no-op."""
    from mural_tpu.train.loop import TrainOptions, train_trial

    config = dict(
        local_radius=2, local_order=1, local_dropout=0.0,
        distal_fc_dropout=0.0, emb_dropout=0.0,
        local_hidden1_size=8, local_hidden2_size=4,
        distal_radius=105, segment_center=5000, sampled_segments=4,
        batch_size=32, optim="Adam", learning_rate=5e-3,
        lr_scheduler="StepLR", LR_gamma=0.9, weight_decay=0.0,
        weight_decay_auto=None, restart_lr=1e-4, min_lr=1e-6,
        CNN_kernel_size=3, CNN_out_channels=4, transfer_learning=False)

    losses = {}
    for dp in (1, 8):
        opts = TrainOptions(
            train_data=tiny_bed, ref_genome=tiny_genome["path"],
            n_class=4, model_no=2, epochs=1, valid_ratio=0.25,
            split_seed=2, trial_dir=str(tmp_path / f"dp{dp}"),
            rng_seed=0, dp_devices=dp)
        metrics = train_trial(dict(config), opts, "snv")
        losses[dp] = metrics["loss"]
    # cross-device reductions (BN stats, CE-sum, grad all-reduce) change
    # f32 summation order; the drift compounds over an epoch of steps
    assert losses[1] == pytest.approx(losses[8], rel=5e-3), losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_predict_matches_single(tiny_genome, tiny_bed):
    from mural_tpu.data.dataset import prepare_dataset
    from mural_tpu.models.registry import build_model
    from mural_tpu.parallel.sharded_predict import sharded_predict
    from mural_tpu.train.loop import _init_variables
    from mural_tpu.train.steps import make_eval_step
    from mural_tpu.data.batcher import segment_pool_batches
    from mural_tpu.data.prefetch import prefetch

    ds = prepare_dataset(tiny_bed, tiny_genome["path"], central_bp=5000,
                         local_radius=3, local_order=2,
                         distal_radius=105, model_type="snv")
    config = dict(local_order=2, local_hidden1_size=8,
                  local_hidden2_size=4, emb_dropout=0.0,
                  local_dropout=0.0, CNN_out_channels=4,
                  CNN_kernel_size=3, distal_fc_dropout=0.0)
    common = dict(emb_dims=[(17, 2)] * ds.cat.shape[1], n_cont=0,
                  n_class=4, distal_order=1, in_channels=4)
    model = build_model(2, config, common, "snv")
    variables = _init_variables(model, ds, 0)

    logits8, loss8 = sharded_predict(model, variables["params"],
                                     variables["batch_stats"], ds, 64, 8)
    # single-device reference
    eval_step = make_eval_step(model)
    parts = []
    loss1 = 0.0
    for db in prefetch(segment_pool_batches(ds, 1, 64, shuffle=False,
                                            pad_final=True), 2):
        lg, ls = eval_step(variables["params"], variables["batch_stats"],
                           db.y, db.cat, db.cont, db.distal, db.mask)
        parts.append(np.asarray(lg)[:db.n_valid])
        loss1 += float(ls)
    logits1 = np.concatenate(parts)
    assert logits8.shape == logits1.shape
    assert np.allclose(logits8, logits1, atol=1e-4)
    assert loss8 == pytest.approx(loss1, rel=1e-5)


def test_distributed_initialize_noop():
    from mural_tpu.parallel.distributed import initialize, is_primary
    initialize()        # single-process: must not raise
    assert is_primary()
