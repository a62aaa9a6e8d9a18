"""Per-execute transport cost vs argument/output buffer count and bytes.
Chained (state -> state) donated programs, 6 dispatches in flight."""
import time
import jax, jax.numpy as jnp

def rate(n_bufs, kb_each, n=24, inflight=6):
    sz = kb_each * 256
    state = [jnp.full((sz,), float(i), jnp.float32) for i in range(n_bufs)]
    f = jax.jit(lambda s: [x + 1.0 for x in s], donate_argnums=(0,))
    state = f(state); jax.block_until_ready(state)
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(n // inflight):
            for _ in range(inflight):
                state = f(state)
            jax.block_until_ready(state)
        ts.append((time.time() - t0) / n * 1000)
    ts.sort()
    return ts[1]

print("buffer-count sweep (64KB each):")
for nb in (1, 2, 4, 8, 16, 32):
    print(f"  {nb:3d} bufs x 64KB: {rate(nb, 64):7.3f} ms/dispatch")
print("bytes sweep (4 buffers):")
for kb in (16, 64, 256, 1024, 2048):
    print(f"  4 bufs x {kb:5d}KB: {rate(4, kb):7.3f} ms/dispatch")
