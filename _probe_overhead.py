import time
import jax, jax.numpy as jnp
import numpy as np

def bench(f, x, n=30, label=""):
    x = f(x); jax.block_until_ready(x)
    t0=time.time()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"{label}: {(time.time()-t0)/n*1000:.3f} ms/iter")
    return x

# vary donated buffer size
for mb in (1, 8, 32):
    n = mb*1024*1024//4
    f = jax.jit(lambda x: x*1.000001 + 1.0, donate_argnums=0)
    bench(f, jnp.zeros(n, jnp.float32), label=f"donated {mb}MB elementwise")

# same but NOT donated
for mb in (8, 32):
    n = mb*1024*1024//4
    f = jax.jit(lambda x: x*1.000001 + 1.0)
    bench(f, jnp.zeros(n, jnp.float32), label=f"non-donated {mb}MB elementwise")

# many outputs
f = jax.jit(lambda x: tuple(x+i for i in range(16)), donate_argnums=0)
x = jnp.zeros(1024*1024, jnp.float32)
y = f(x); jax.block_until_ready(y)
t0=time.time()
for _ in range(30):
    y = f(y[0])
jax.block_until_ready(y)
print(f"16 outputs 4MB: {(time.time()-t0)/30*1000:.3f} ms/iter")

# compute-heavy: matmul chain ~2.5ms device
a = jnp.zeros((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda x: x @ x)
bench(f, a, n=20, label="4096^3 matmul chain")
