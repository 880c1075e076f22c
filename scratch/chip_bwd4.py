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

@partial(jax.jit, static_argnames=("cols", "dt"))
def scat(ids, cols, dt):
    cot = jnp.ones((n, cols), dt) if cols > 1 else jnp.ones((n,), dt)
    z = jnp.zeros((m, cols) if cols > 1 else (m,), dt)
    return z.at[ids].add(cot)

def bench(cols, dt, name):
    f = lambda: scat(ids, cols, dt)
    r = f(); float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(4): r = f(); float(jnp.sum(r.astype(jnp.float32)))
    print(f"{name:14s} {(time.time()-t0)/4*1e3:8.1f} ms", flush=True)

bench(7, jnp.float32, "f32 x7")
bench(1, jnp.float32, "f32 x1")
bench(2, jnp.float32, "f32 x2")
bench(7, jnp.bfloat16, "bf16 x7")
bench(4, jnp.float32, "f32 x4")
