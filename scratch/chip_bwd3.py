import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from functools import partial
print(jax.devices(), file=sys.stderr)

key = jax.random.PRNGKey(0)

@partial(jax.jit, static_argnames=("n", "m"))
def scat(ids, cot, n, m):
    return jnp.zeros((m, 7), jnp.float32).at[ids[:n]].add(cot[:n])

ids_full = jax.random.randint(key, (1 << 20,), 0, 1_100_000, jnp.int32)
cot_full = jax.random.uniform(key, (1 << 20, 7), jnp.float32)

def bench(n, m):
    f = lambda: scat(ids_full % m, cot_full, n, m)
    r = f(); float(jnp.sum(r))
    t0 = time.time()
    for _ in range(4): r = f(); float(jnp.sum(r))
    dt = (time.time()-t0)/4
    print(f"n={n:8d} m={m:8d}: {dt*1e3:8.1f} ms  ({dt/n*1e9:6.1f} ns/row)",
          flush=True)

bench(1 << 20, 1_100_000)
bench(1 << 19, 1_100_000)
bench(1 << 18, 1_100_000)
bench(1 << 20, 65536)
bench(1 << 18, 65536)
