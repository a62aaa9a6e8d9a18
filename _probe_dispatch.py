import time
import jax, jax.numpy as jnp

@jax.jit
def tiny(x):
    return x + 1.0

x = jnp.zeros(8)
x = tiny(x); x.block_until_ready()
# measure round-trip dispatch latency for a trivial program
for trial in range(3):
    t0 = time.time()
    N = 50
    for _ in range(N):
        x = tiny(x)
    x.block_until_ready()
    print(f"tiny dispatch (pipelined, {N}x): {(time.time()-t0)/N*1000:.3f} ms/iter")
for trial in range(3):
    t0 = time.time()
    N = 20
    for _ in range(N):
        x = tiny(x)
        x.block_until_ready()
    print(f"tiny dispatch (sync each): {(time.time()-t0)/N*1000:.3f} ms/iter")
