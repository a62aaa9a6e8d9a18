"""Dependent-chain dispatch cost vs buffer size / donation / outputs."""
import time
import jax, jax.numpy as jnp

def chain(f, b, n=20):
    b = f(b)
    jax.block_until_ready(b)
    t0 = time.time()
    for _ in range(n):
        b = f(b)
    jax.block_until_ready(b)
    return (time.time() - t0) / n * 1000

for kb in (4, 64, 256, 1024, 4096):
    n = kb * 256  # f32 elements
    x = jnp.zeros((n,), jnp.float32)
    f_plain = jax.jit(lambda b: b + 1.0)
    f_don = jax.jit(lambda b: b + 1.0, donate_argnums=(0,))
    t_plain = chain(f_plain, x)
    x = jnp.zeros((n,), jnp.float32)
    t_don = chain(f_don, x)
    print(f"{kb:5d} KB: plain {t_plain:7.3f} ms   donated {t_don:7.3f} ms")

# repeat the 1MB donated case a few times for variance
for rep in range(4):
    x = jnp.zeros((256 * 1024,), jnp.float32)
    f_don = jax.jit(lambda b: b + 1.0, donate_argnums=(0,))
    print(f"1MB donated rep{rep}: {chain(f_don, x):7.3f} ms")
