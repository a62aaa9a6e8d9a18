import time, json
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _example_batch, _flagship
from mural_tpu.models.init import materialize_variables
from mural_tpu.train.optim import LRSchedule
from mural_tpu.train.packed import make_packed_train_step, pack_state
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

for name, bf16 in (("f32", False), ("bf16", True)):
    step = make_packed_train_step(model, fresh_state(), donate=True, bf16=bf16)
    state = fresh_state()
    t0=time.time()
    state, loss, _ = step(state, y, cat, None, codes, mask, rng)
    loss.block_until_ready()
    print(f"{name} warmup+compile: {time.time()-t0:.2f}s")
    blocks=[]
    for b in range(8):
        t0=time.time()
        for _ in range(6):
            state, loss, _ = step(state, y, cat, None, codes, mask, rng)
        loss.block_until_ready()
        blocks.append((time.time()-t0)/6)
    print(f"{name} per-iter blocks (ms): {[round(t*1000,2) for t in blocks]}")
    blocks.sort()
    med = blocks[len(blocks)//2]
    print(f"{name} median {med*1000:.2f} ms -> {BATCH/med:,.0f} windows/s")
