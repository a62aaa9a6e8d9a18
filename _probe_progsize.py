"""Pipelined dispatch cost vs compiled-program size (op count),
compute held trivial."""
import time
import jax, jax.numpy as jnp

def measure(n_ops, n=24, inflight=6):
    def f(x):
        # n_ops distinct small ops that can't collapse: rotate + add const
        for i in range(n_ops):
            x = jnp.roll(x, 1) + (i % 7) * 0.001
        return x
    jf = jax.jit(f, donate_argnums=(0,))
    x = jnp.zeros((128,), jnp.float32)
    x = jf(x); jax.block_until_ready(x)
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(n // inflight):
            for _ in range(inflight):
                x = jf(x)
            jax.block_until_ready(x)
        ts.append((time.time() - t0) / n * 1000)
    ts.sort()
    # sync latency too
    t0 = time.time()
    for _ in range(5):
        x = jf(x); jax.block_until_ready(x)
    sync = (time.time() - t0) / 5 * 1000
    return ts[1], sync

for ops in (10, 100, 400, 1000, 2000):
    piped, sync = measure(ops)
    print(f"{ops:5d} ops: pipelined {piped:7.3f} ms  sync {sync:7.2f} ms")
