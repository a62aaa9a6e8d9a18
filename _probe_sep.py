"""Separate large-IO-buffer cost from conv-op cost."""
import time
import jax, jax.numpy as jnp

def bench(jf, x):
    s = jf(x); jax.block_until_ready(s)
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(4):
            for _ in range(6):
                s = jf(s)
            jax.block_until_ready(s)
        ts.append((time.time() - t0) / 24 * 1000)
    ts.sort()
    t0 = time.time()
    for _ in range(5):
        s = jf(s); jax.block_until_ready(s)
    sync = (time.time() - t0) / 5 * 1000
    return ts[1], sync

ew = jax.jit(lambda x: x * 1.0001 + 0.001)
ew_d = jax.jit(lambda x: x * 1.0001 + 0.001, donate_argnums=(0,))
for name, shape in (("1.6MB", (32, 401, 32)), ("13MB", (256, 401, 32)),
                    ("105MB", (2048, 401, 32))):
    x = jnp.zeros(shape, jnp.float32)
    p, s = bench(ew, x)
    x = jnp.zeros(shape, jnp.float32)
    pd, sd = bench(ew_d, x)
    print(f"elementwise {name}: plain {p:7.3f}/{s:6.2f} ms  "
          f"donated {pd:7.3f}/{sd:6.2f} ms (pipelined/sync)")

key = jax.random.key(0)
w = jax.random.normal(key, (3, 32, 32), jnp.float32) * 0.05
conv = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")))
for name, shape in (("1.6MB", (32, 401, 32)), ("13MB", (256, 401, 32))):
    x = jnp.zeros(shape, jnp.float32)
    p, s = bench(conv, x)
    print(f"1 conv {name}: {p:7.3f}/{s:6.2f} ms (pipelined/sync)")
