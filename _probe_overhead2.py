"""Characterize the per-dispatch overhead: does it scale with arg count,
donated-buffer size, or output count?"""
import time
import jax, jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, pipelined=True, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    outs = None
    t0 = time.time()
    if pipelined:
        for _ in range(n):
            outs = fn(*args, **kw)
        jax.block_until_ready(outs)
    else:
        for _ in range(n):
            outs = fn(*args, **kw)
            jax.block_until_ready(outs)
    return (time.time() - t0) / n * 1000


# 1. big matmul: device compute integrity
x = jnp.zeros((4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
dt = timeit(mm, x)
print(f"4096^3 bf16 matmul: {dt:.2f} ms -> {2*4096**3/dt*1e-9:.1f} TFLOP/s")

# 2. donated 1MB buffer, trivial compute
buf = jnp.zeros((256 * 1024,), jnp.float32)
f_don = jax.jit(lambda b: b + 1.0, donate_argnums=(0,))
b = buf
t0 = time.time(); N = 30
for _ in range(N):
    b = f_don(b)
b.block_until_ready()
print(f"donated 1MB add (pipelined): {(time.time()-t0)/N*1000:.3f} ms")

# 3. many args (like the train step: state pytree + 6 batch arrays)
args = [jnp.zeros((2048, 13), jnp.int32), jnp.zeros((2048, 401), jnp.int8),
        jnp.zeros((2048,), jnp.int32), jnp.zeros((2048,), jnp.float32)]
state = [jnp.zeros((256 * 1024,), jnp.float32) for _ in range(8)]

@jax.jit
def manyarg(state, a, b, c, d):
    s = [x + 1.0 for x in state]
    return s, jnp.sum(d)

out = None
sd = state
t0 = time.time()
for _ in range(N):
    sd, loss = manyarg(sd, *args)
loss.block_until_ready()
print(f"8x1MB state + 4 batch args (pipelined, no donate): "
      f"{(time.time()-t0)/N*1000:.3f} ms")

manyarg_d = jax.jit(
    lambda state, a, b, c, d: ([x + 1.0 for x in state], jnp.sum(d)),
    donate_argnums=(0,))
sd = [jnp.zeros((256 * 1024,), jnp.float32) for _ in range(8)]
t0 = time.time()
for _ in range(N):
    sd, loss = manyarg_d(sd, *args)
loss.block_until_ready()
print(f"8x1MB state + 4 batch args (pipelined, donated): "
      f"{(time.time()-t0)/N*1000:.3f} ms")

# 4. compute ~3ms program, few buffers: is overhead additive or hidden?
y = jnp.zeros((2048, 2048), jnp.float32)
mm10 = jax.jit(lambda a: jnp.sin(a @ a))
dt = timeit(mm10, y)
print(f"2048^3 f32 matmul+sin: {dt:.2f} ms")
