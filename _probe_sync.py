import time
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.key(0)
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
f = jax.jit(lambda x: (x @ x) * 1e-3)
x = f(a); jax.block_until_ready(x); float(x[0,0])

# chain of 20 matmuls, sync with block_until_ready
t0=time.time()
x = a
for _ in range(20):
    x = f(x)
jax.block_until_ready(x)
t_bur = time.time()-t0
# now fetch a scalar (true sync)
t1=time.time()
v = float(x[0,0])
t_fetch = time.time()-t1
print(f"20-matmul chain: block_until_ready={t_bur*1000:.1f}ms, then scalar fetch={t_fetch*1000:.1f}ms")
print(f"per-matmul true: {(t_bur+t_fetch)/20*1000:.3f} ms (expect ~0.7ms at v5e peak)")
