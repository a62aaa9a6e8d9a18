#!/usr/bin/env python
"""Benchmark: SNV training throughput (windows/sec/chip) on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference architecture (Network2, reference default
hyperparameters: local_radius 7 / local_order 3 / distal_radius 200 /
k3 / ch32) implemented in torch and measured on this host's CPU at
1,384 windows/s per train step (see BASELINE.md "Measured anchors").
The reference repo publishes no absolute throughput numbers
(SURVEY.md section 6), so vs_baseline is ours / torch-CPU-anchor.
"""

import json
import time

BASELINE_TRAIN_WINDOWS_PER_SEC = 1384.0   # torch CPU anchor, BASELINE.md
BATCH = 2048
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship
    from mural_tpu.models.layers import one_hot_from_codes
    from mural_tpu.train.optim import LRSchedule
    from mural_tpu.train.state import create_train_state
    from mural_tpu.train.steps import make_train_step

    from mural_tpu.models.init import materialize_variables
    from mural_tpu.utils.compile_cache import _enable_compilation_cache
    _enable_compilation_cache()

    model = _flagship()
    y, cat, codes, mask = _example_batch(batch=BATCH)
    template = jax.eval_shape(
        lambda k, c, d: model.init(k, c, None, d, False),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((2, 13), jnp.int32),
        jax.ShapeDtypeStruct((2, 401, 4), jnp.float32))
    variables = jax.device_put(materialize_variables(
        {"params": template["params"],
         "batch_stats": template["batch_stats"]}, 0))
    sched = LRSchedule.build("StepLR", 1e-3, 0.9, BATCH, 10_000_000,
                             1e-4, 1e-6)
    state = create_train_state(model, variables, "Adam", 1e-5, sched)
    step = make_train_step(model, donate=True)
    rng = jax.random.key(1)
    y, cat, codes, mask = map(jnp.asarray, (y, cat, codes, mask))

    # compile + warmup
    state, loss, _ = step(state, y, cat, None, codes, mask, rng)
    loss.block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        state, loss, _ = step(state, y, cat, None, codes, mask, rng)
    loss.block_until_ready()
    dt = (time.time() - t0) / ITERS
    value = BATCH / dt

    print(json.dumps({
        "metric": "snv_train_windows_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "windows/s",
        "vs_baseline": round(value / BASELINE_TRAIN_WINDOWS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
