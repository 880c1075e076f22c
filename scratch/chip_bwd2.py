import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
print(jax.devices(), file=sys.stderr)

n, m = 1 << 20, 1_100_000
key = jax.random.PRNGKey(0)
# realistic duplication: ~4 rays per hit leaf
ids = jax.random.randint(key, (n,), 0, m // 4, jnp.int32) * 4
cot = jax.random.uniform(key, (n, 7), jnp.float32)

@jax.jit
def v_cumsum_scatter(ids, cot):
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    cs = jnp.cumsum(jnp.take(cot, order, axis=0), axis=0)
    # segment end = last position of each id run
    is_end = jnp.concatenate([sid[1:] != sid[:-1],
                              jnp.ones(1, bool)])
    seg_total = jnp.where(is_end[:, None], cs, 0.0)
    # subtract previous segment's cumsum: previous end position
    prev_end = jnp.where(is_end, jnp.cumsum(is_end.astype(jnp.int32)) - 1, -1)
    ends = jnp.flatnonzero(is_end, size=n, fill_value=n - 1)
    end_cs = jnp.take(cs, ends, axis=0)
    prev_cs = jnp.concatenate([jnp.zeros((1, 7)), end_cs[:-1]])
    sums = end_cs - prev_cs                       # (n, 7), tail garbage
    out_ids = jnp.take(sid, ends)
    k = jnp.arange(n) < jnp.sum(is_end)
    out_ids = jnp.where(k, out_ids, m)            # dropped
    return jnp.zeros((m, 7), jnp.float32).at[out_ids].add(
        jnp.where(k[:, None], sums, 0.0), mode="drop",
        indices_are_sorted=True, unique_indices=True)

@jax.jit
def v_scatter_flags(ids, cot):
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    return jnp.zeros((m, 7), jnp.float32).at[sid].add(
        jnp.take(cot, order, axis=0), indices_are_sorted=True)

@jax.jit
def v_scatter_raw(ids, cot):
    return jnp.zeros((m, 7), jnp.float32).at[ids].add(cot)

def bench(name, f):
    r = f(ids, cot); float(jnp.sum(r))
    t0 = time.time()
    for _ in range(4): r = f(ids, cot); float(jnp.sum(r))
    print(f"{name:22s} {(time.time()-t0)/4*1e3:8.1f} ms", flush=True)
    return r

r0 = bench("scatter_raw", v_scatter_raw)
r1 = bench("scatter_sorted_flag", v_scatter_flags)
r2 = bench("cumsum+unique_scatter", v_cumsum_scatter)
print("allclose:", bool(jnp.allclose(r0, r2, rtol=1e-4, atol=1e-3)),
      bool(jnp.allclose(r0, r1, rtol=1e-4, atol=1e-3)))
