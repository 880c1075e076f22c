import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import jax, jax.numpy as jnp
from functools import partial
print(jax.devices(), file=sys.stderr)

key = jax.random.PRNGKey(0)
n, m = 1 << 20, 1_100_000
ids = jax.random.randint(key, (n,), 0, m, jnp.int32)
cot = jax.random.uniform(key, (n, 7), jnp.float32)

@jax.jit
def seven_scalar(ids, cot):
    outs = [jnp.zeros((m,), jnp.float32).at[ids].add(cot[:, j])
            for j in range(7)]
    return jnp.stack(outs, 1)

@jax.jit
def flat7(ids, cot):
    # one scalar scatter of 7n rows into (7m,)
    ids7 = (ids[None, :] + (jnp.arange(7, dtype=jnp.int32) * m)[:, None]
            ).reshape(-1)
    return jnp.zeros((7 * m,), jnp.float32).at[ids7].add(
        cot.T.reshape(-1)).reshape(7, m).T

@jax.jit
def raw7(ids, cot):
    return jnp.zeros((m, 7), jnp.float32).at[ids].add(cot)

def bench(name, f):
    r = f(ids, cot); float(jnp.sum(r))
    t0 = time.time()
    for _ in range(4): r = f(ids, cot); float(jnp.sum(r))
    print(f"{name:14s} {(time.time()-t0)/4*1e3:8.1f} ms", flush=True)
    return r

r0 = bench("raw (m,7)", raw7)
r1 = bench("7x scalar", seven_scalar)
r2 = bench("flat 7n", flat7)
print("allclose:", bool(jnp.allclose(r0, r1, rtol=1e-5, atol=1e-4)),
      bool(jnp.allclose(r0, r2, rtol=1e-5, atol=1e-4)))
