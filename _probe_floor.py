"""Pipeline-depth floor + scan-K amortization for the real train step."""
import time
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _example_batch, _flagship
from mural_tpu.models.init import materialize_variables
from mural_tpu.train.optim import LRSchedule
from mural_tpu.train.packed import (make_packed_train_step, pack_state,
                                    make_packed_train_step_scan)
from mural_tpu.train.state import create_train_state
from mural_tpu.utils.compile_cache import _enable_compilation_cache
_enable_compilation_cache()

BATCH = 2048
model = _flagship()
y, cat, codes, mask = _example_batch(batch=BATCH)
template = jax.eval_shape(
    lambda k, c, d: model.init(k, c, None, d, False),
    jax.ShapeDtypeStruct((2,), jnp.uint32),
    jax.ShapeDtypeStruct((2, 13), jnp.int32),
    jax.ShapeDtypeStruct((2, 401, 4), jnp.float32))
variables_host = jax.tree.map(np.asarray, materialize_variables(
    {"params": template["params"], "batch_stats": template["batch_stats"]}, 0))
sched = LRSchedule.build("StepLR", 1e-3, 0.9, BATCH, 10_000_000, 1e-4, 1e-6)

def fresh_state():
    return pack_state(create_train_state(
        model, jax.device_put(variables_host), "Adam", 1e-5, sched))

rng = jax.random.key(1)
y, cat, codes, mask = map(jnp.asarray, (y, cat, codes, mask))

for bf16 in (False, True):
    tag = "bf16" if bf16 else "f32"
    step = make_packed_train_step(model, fresh_state(), donate=True, bf16=bf16)
    state = fresh_state()
    state, loss, _ = step(state, y, cat, None, codes, mask, rng)
    loss.block_until_ready()
    for inflight in (2, 6, 12, 24):
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(inflight):
                state, loss, _ = step(state, y, cat, None, codes, mask, rng)
            loss.block_until_ready()
            ts.append((time.time() - t0) / inflight * 1000)
        ts.sort()
        print(f"{tag} single-step inflight={inflight:2d}: {ts[1]:6.2f} ms "
              f"-> {BATCH/ts[1]*1000:,.0f} w/s")
    for K in (8, 16, 32):
        ys = jnp.tile(y[None], (K, 1)); cats = jnp.tile(cat[None], (K, 1, 1))
        codess = jnp.tile(codes[None], (K, 1, 1))
        masks = jnp.tile(mask[None], (K, 1))
        conts = jnp.zeros((K, BATCH, 0), jnp.float32)
        stepK = make_packed_train_step_scan(model, fresh_state(), bf16=bf16)
        stateK = fresh_state()
        stateK, lossesK, _ = stepK(stateK, ys, cats, conts, codess, masks, rng)
        lossesK.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):  # 2 dispatches in flight
                stateK, lossesK, _ = stepK(stateK, ys, cats, conts, codess,
                                           masks, rng)
            lossesK.block_until_ready()
            ts.append((time.time() - t0) / (2 * K) * 1000)
        ts.sort()
        print(f"{tag} scan K={K:2d} (2 in flight): {ts[1]:6.2f} ms/step "
              f"-> {BATCH/ts[1]*1000:,.0f} w/s")
