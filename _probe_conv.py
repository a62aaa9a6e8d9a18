"""Is the per-dispatch penalty per conv op? Do dot-based convs avoid it?"""
import time
import jax, jax.numpy as jnp

def bench(jf, x, n=24, inflight=6):
    s = jf(x); jax.block_until_ready(s)
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(n // inflight):
            for _ in range(inflight):
                s = jf(s)
            jax.block_until_ready(s)
        ts.append((time.time() - t0) / n * 1000)
    ts.sort()
    t0 = time.time()
    for _ in range(5):
        s = jf(s); jax.block_until_ready(s)
    sync = (time.time() - t0) / 5 * 1000
    return ts[1], sync

key = jax.random.key(0)
w = jax.random.normal(key, (8, 3, 32, 32), jnp.float32) * 0.05

def make_convs(k):
    def f(x):
        for i in range(k):
            x = jax.lax.conv_general_dilated(
                x, w[i], (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC"))
            x = jnp.maximum(x, 0.0) * 0.999
        return x
    return jax.jit(f)

x0 = jnp.zeros((2048, 401, 32), jnp.float32)
for k in (1, 2, 4, 8):
    p, s = bench(make_convs(k), x0)
    print(f"{k} convs: pipelined {p:7.3f} ms  sync {s:7.2f} ms")

# dot-based conv: unfold taps by slicing, single dot per layer
wm = jax.random.normal(key, (8, 96, 32), jnp.float32) * 0.05
def make_dots(k):
    def f(x):
        for i in range(k):
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
            taps = jnp.concatenate(
                [xp[:, j:j + x.shape[1], :] for j in range(3)], axis=-1)
            x = jnp.maximum(jnp.einsum("bwk,ko->bwo", taps, wm[i]), 0.0) * 0.999
        return x
    return jax.jit(f)

for k in (1, 8):
    p, s = bench(make_dots(k), x0)
    print(f"{k} dot-convs: pipelined {p:7.3f} ms  sync {s:7.2f} ms")
