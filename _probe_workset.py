"""Dispatch cost vs HBM working set and conv content."""
import time
import jax, jax.numpy as jnp
import numpy as np

def bench(jf, x, n=24, inflight=6, chained=True):
    s = jf(x); jax.block_until_ready(s)
    ts = []
    for _ in range(4):
        t0 = time.time()
        if chained:
            for _ in range(n // inflight):
                for _ in range(inflight):
                    s = jf(s)
                jax.block_until_ready(s)
        else:
            for _ in range(n):
                s = jf(x)
            jax.block_until_ready(s)
        ts.append((time.time() - t0) / n * 1000)
    ts.sort()
    t0 = time.time()
    for _ in range(5):
        s = jf(s if chained else x); jax.block_until_ready(s)
    sync = (time.time() - t0) / 5 * 1000
    return ts[1], sync

# A) big temp working set (~105 MB of temps), tiny in/out
def big_temps(x):
    t = jnp.broadcast_to(x, (2048, 6400)) + 1.0   # 52 MB
    t = jnp.sin(t) * 1.0001
    t2 = t * 2.0                                   # another 52 MB
    return jnp.mean(t2, axis=0) * 0.999
x = jnp.zeros((6400,), jnp.float32)
p, s = bench(jax.jit(big_temps), jnp.zeros((6400,), jnp.float32))
print(f"big-temps (105MB temps): pipelined {p:7.3f} ms  sync {s:7.2f} ms")

# B) conv stack like the SNV tower: (2048, 401, 32), 8 convs k=3
key = jax.random.key(0)
w = jax.random.normal(key, (8, 3, 32, 32), jnp.float32) * 0.05
def convs(x):
    for i in range(8):
        x = jax.lax.conv_general_dilated(
            x, w[i], (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        x = jnp.maximum(x, 0.0) * 0.999
    return x
x = jnp.zeros((2048, 401, 32), jnp.float32)
p, s = bench(jax.jit(convs), x)
print(f"conv stack x8 (2048,401,32): pipelined {p:7.3f} ms  sync {s:7.2f} ms")

# C) same conv stack but 1/8 batch (256)
x = jnp.zeros((256, 401, 32), jnp.float32)
p, s = bench(jax.jit(convs), x)
print(f"conv stack x8 (256,401,32):  pipelined {p:7.3f} ms  sync {s:7.2f} ms")
