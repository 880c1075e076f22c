import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
print(jax.devices(), file=sys.stderr)

n, m = 1 << 20, 1_100_000
key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (n,), 0, m, jnp.int32)
cot = jax.random.uniform(key, (n, 7), jnp.float32)

@jax.jit
def via_sort(ids, cot):
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    return jax.ops.segment_sum(jnp.take(cot, order, axis=0), sid,
                               num_segments=m, indices_are_sorted=True)

@jax.jit
def via_scatter(ids, cot):
    return jnp.zeros((m, 7), jnp.float32).at[ids].add(cot)

@jax.jit
def via_segsum_unsorted(ids, cot):
    return jax.ops.segment_sum(cot, ids, num_segments=m)

def bench(name, f):
    r = f(ids, cot); float(jnp.sum(r))
    t0 = time.time()
    for _ in range(4): r = f(ids, cot); float(jnp.sum(r))
    print(f"{name:20s} {(time.time()-t0)/4*1e3:8.1f} ms", flush=True)

bench("sort+segment", via_sort)
bench("scatter_add", via_scatter)
bench("segsum_unsorted", via_segsum_unsorted)
r1 = via_sort(ids, cot); r2 = via_scatter(ids, cot)
print("allclose:", bool(jnp.allclose(r1, r2, atol=1e-3)))
