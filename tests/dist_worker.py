"""Subprocess body for the 2-process jax.distributed coordination test.

Spawned by tests/test_distributed.py: each process pins a 2-device
virtual CPU platform, joins the coordinator, and runs one data-parallel
train step over the GLOBAL 4-device mesh (2 processes x 2 local
devices).  Prints `RESULT <process_id> <loss>` on success; both
processes must print the same loss (same global batch, psum'd grads).
"""
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mural_tpu.parallel.distributed import initialize, is_primary
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc
    assert jax.device_count() == 2 * n_proc

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_batch, _flagship
    from mural_tpu.models.init import materialize_variables
    from mural_tpu.parallel.mesh import batch_sharding, replicated
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.state import create_train_state
    from mural_tpu.train.steps import make_train_step

    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)

    model = _flagship()
    batch = 8 * jax.device_count()
    y, cat, codes, mask = _example_batch(batch=batch, width=401)

    template = jax.eval_shape(
        lambda k, c, d: model.init(k, c, None, d, False),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((2, 13), jnp.int32),
        jax.ShapeDtypeStruct((2, 401, 4), jnp.float32))
    variables = materialize_variables(
        {"params": template["params"],
         "batch_stats": template["batch_stats"]}, 0)
    sched = LRSchedule.build("StepLR", 1e-3, 0.9, batch, 10_000, 1e-4,
                             1e-6)
    # host (numpy) leaves stay host-side: uncommitted inputs to a jitted
    # multi-process computation are implicitly replicated; an explicit
    # device_put to a cross-process sharding is not allowed
    state = create_train_state(model, variables, "Adam", 1e-5, sched)

    # same-seeded global batch on every process; each contributes its
    # local half, assembled into one global sharded array
    from jax.experimental import multihost_utils
    half = batch // n_proc
    lo = proc_id * half
    gbatch = [multihost_utils.host_local_array_to_global_array(
        x[lo:lo + half], mesh, jax.sharding.PartitionSpec("data"))
        for x in (y, cat, codes, mask)]
    rng = jax.random.key(1)

    step = make_train_step(model, donate=False)
    _, loss, _ = step(state, gbatch[0], gbatch[1], None, gbatch[2],
                      gbatch[3], rng)
    # the reduced loss is replicated over the mesh; read this process's
    # addressable copy
    loss_val = float(np.asarray(loss.addressable_data(0)))
    print(f"RESULT {proc_id} {loss_val:.6f} primary={is_primary()}",
          flush=True)


if __name__ == "__main__":
    main()
