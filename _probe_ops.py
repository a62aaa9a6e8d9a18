"""Which HLO ops trigger the slow per-dispatch path?"""
import time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

def bench(jf, x):
    s = jf(x); jax.block_until_ready(s)
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            for _ in range(6):
                s = jf(s)
            jax.block_until_ready(s)
        ts.append((time.time() - t0) / 18 * 1000)
    ts.sort()
    return ts[1]

B, W, C = 256, 400, 32
x0 = jnp.zeros((B, W, C), jnp.float32)
key = jax.random.key(0)
w32 = jax.random.normal(key, (C * 3, C), jnp.float32) * 0.05
wk = jax.random.normal(key, (3, C, C), jnp.float32) * 0.05

cases = {
    "baseline-elementwise": lambda x: x * 1.0001 + 0.001,
    "pad": lambda x: jnp.pad(x, ((0, 0), (1, 1), (0, 0)))[:, 1:-1, :] * 1.0001,
    "concat-slices": lambda x: (jnp.concatenate(
        [x[:, 0:1, :], x[:, 1:, :]], axis=1) * 1.0001),
    "einsum-bwk,ko": lambda x: jnp.einsum(
        "bwk,ko->bwo", jnp.concatenate([x, x, x], axis=-1), w32) * 0.01,
    "dot-2d": lambda x: (x.reshape(B * W, C) @ wk[0]).reshape(B, W, C) * 0.01,
    "reduce-window-max": lambda x: jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME") * 0.999,
    "reshape-maxpool": lambda x: jnp.broadcast_to(
        jnp.max(x.reshape(B, 100, 4, C), axis=2, keepdims=True),
        (B, 100, 4, C)).reshape(B, W, C) * 0.999,
    "bn-like-reduce": lambda x: (x - jnp.mean(x, axis=(0, 1))) * jax.lax.rsqrt(
        jnp.var(x, axis=(0, 1)) + 1e-5) * 0.999 + x * 0.001,
    "take-gather": lambda x: jnp.take(
        x.reshape(-1, C), jnp.arange(B * W) % (B * W), axis=0).reshape(
        B, W, C) * 0.9999,
    "argmax-onehot": lambda x: (jax.nn.one_hot(
        jnp.argmax(x, axis=-1), C) * 0.001 + x * 0.999),
    "transpose": lambda x: jnp.transpose(
        jnp.transpose(x, (2, 1, 0)) * 1.0001, (2, 1, 0)),
    "cumsum": lambda x: jnp.cumsum(x, axis=1) * 0.001 + x * 0.999,
    "rng-bits": lambda x: x * 0.999 + jax.random.uniform(
        jax.random.key(3), (B, W, C)) * 0.001,
    "dynamic-slice": lambda x: jax.lax.dynamic_update_slice(
        x, x[:, :10, :] * 1.001, (0, 0, 0)),
    "conv": lambda x: jax.lax.conv_general_dilated(
        x, wk[0][None].transpose(0, 1, 2), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC")) * 0.01,
}
for name, f in cases.items():
    print(f"{name:22s}: {bench(jax.jit(f), x0):7.3f} ms/dispatch")
