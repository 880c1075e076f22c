"""Round-4 backward probe #2: fixed id-perturbation (probe #1 let XLA hoist
id-only ops out of the rep loop) + the assembled diff-of-gather pipeline."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
print(jax.devices(), file=sys.stderr)

n, m = 1 << 20, 1_100_000
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
ids0 = jax.random.randint(k1, (n,), 0, m, jnp.int32)
cot = jax.random.uniform(k2, (n, 7), jnp.float32) - 0.5


def rep_jit(body, k):
    @jax.jit
    def f(ids, cot):
        def step(i, acc):
            ids_i = jnp.roll(ids, i)          # perturb ids: defeats hoisting
            return acc + jnp.sum(body(ids_i, cot * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))
    return f


def slope(name, body, k_lo=2, k_hi=6):
    f_lo, f_hi = rep_jit(body, k_lo), rep_jit(body, k_hi)
    float(f_lo(ids0, cot)); float(f_hi(ids0, cot))
    t = {}
    for k, f in ((k_lo, f_lo), (k_hi, f_hi)):
        t0 = time.time()
        for _ in range(2): float(f(ids0, cot))
        t[k] = (time.time() - t0) / 2
    per = (t[k_hi] - t[k_lo]) / (k_hi - k_lo) * 1e3
    print(f"{name:28s} {per:8.1f} ms/op (slope)", flush=True)


slope("argsort 1M i32", lambda ids, c: jnp.argsort(ids).astype(jnp.float32))
slope("histogram i32", lambda ids, c: jnp.zeros(m, jnp.int32).at[ids].add(1)
      .astype(jnp.float32))
slope("sort(keys) 1M i32", lambda ids, c: jnp.sort(ids).astype(jnp.float32))


def seg_pipeline(ids, c):
    order = jnp.argsort(ids)
    rows = jnp.take(c, order, axis=0)
    S = jnp.cumsum(rows, axis=0)
    S = jnp.concatenate([jnp.zeros((1, 7), jnp.float32), S], axis=0)
    cnt = jnp.zeros(m, jnp.int32).at[ids].add(1)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(cnt).astype(jnp.int32)])
    G = jnp.take(S, start, axis=0)            # ONE (m+1)-row gather
    return G[1:] - G[:-1]


def rank7(ids, c):
    outs = [jnp.zeros(m, jnp.float32).at[ids].add(c[:, j]) for j in range(7)]
    return jnp.stack(outs, axis=1)


slope("PIPELINE seg", seg_pipeline, k_lo=1, k_hi=3)
slope("BASELINE rank7", rank7, k_lo=1, k_hi=3)

r1 = jax.jit(seg_pipeline)(ids0, cot)
r2 = jax.jit(rank7)(ids0, cot)
err = float(jnp.max(jnp.abs(r1 - r2)))
scale = float(jnp.max(jnp.abs(r2)))
print(f"seg vs rank7: max abs err {err:.3e}  (max |val| {scale:.3e})")

# clustered ids (tile-coherent hits): does sortedness help either scheme?
ids_sorted = jnp.sort(ids0)
for name, f in (("PIPELINE seg (sorted ids)", seg_pipeline),
                ("BASELINE rank7 (sorted ids)", rank7)):
    g = jax.jit(f)
    float(jnp.sum(g(ids_sorted, cot)))
    t0 = time.time()
    for _ in range(3): float(jnp.sum(g(ids_sorted, cot)))
    print(f"{name:28s} {(time.time()-t0)/3*1e3:8.1f} ms", flush=True)
