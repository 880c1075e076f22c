"""Round-4 backward-scatter probe: can a sort + cumsum + histogram + gather
pipeline beat the seven rank-1 scatter-adds (~63-90 ms at 1M rays)?

Measures each primitive's slope (K reps inside one jit, differenced) plus the
assembled pipelines. Run on the TPU chip (axon tunnel)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
print(jax.devices(), file=sys.stderr)

n, m = 1 << 20, 1_100_000
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
# clustered ids (sorted-ish like tile-major hits) and random ids
ids_rand = jax.random.randint(k1, (n,), 0, m, jnp.int32)
cot = jax.random.uniform(k2, (n, 7), jnp.float32) - 0.5


def timed(name, f, *args, reps=3):
    r = f(*args)
    float(jnp.sum(r) if not isinstance(r, tuple) else sum(jnp.sum(x) for x in r))
    t0 = time.time()
    acc = 0.0
    for i in range(reps):
        r = f(*args)
        acc += float(jnp.sum(r) if not isinstance(r, tuple)
                     else sum(jnp.sum(x) for x in r))
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.1f} ms", flush=True)
    return dt


def rep_jit(body, k):
    """Run body k times inside one jit with perturbed input (defeats CSE)."""
    @jax.jit
    def f(ids, cot):
        def step(i, acc):
            return acc + jnp.sum(body(ids, cot * (1.0 + 1e-6 * i)))
        return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))
    return f


def slope(name, body, k_lo=2, k_hi=6):
    f_lo, f_hi = rep_jit(body, k_lo), rep_jit(body, k_hi)
    float(f_lo(ids_rand, cot)); float(f_hi(ids_rand, cot))
    t = {}
    for k, f in ((k_lo, f_lo), (k_hi, f_hi)):
        t0 = time.time()
        for _ in range(2): float(f(ids_rand, cot))
        t[k] = (time.time() - t0) / 2
    per = (t[k_hi] - t[k_lo]) / (k_hi - k_lo) * 1e3
    print(f"{name:28s} {per:8.1f} ms/op (slope)", flush=True)
    return per


# ---- primitives ----
slope("rank1 scatter x1", lambda ids, c: jnp.zeros(m, jnp.float32).at[ids].add(c[:, 0]))
slope("rank1 scatter x7", lambda ids, c: sum(
    jnp.zeros(m, jnp.float32).at[ids].add(c[:, j]) for j in range(7)))
slope("histogram i32", lambda ids, c: jnp.zeros(m, jnp.int32).at[ids].add(1))
slope("argsort 1M i32", lambda ids, c: jnp.argsort(ids + c[:, 0].astype(jnp.int32)))
slope("take rows (N,7)", lambda ids, c: jnp.take(c, ids & (n - 1), axis=0))
slope("cumsum (N,7) f32", lambda ids, c: jnp.cumsum(c, axis=0))
slope("cumsum (N,) i32", lambda ids, c: jnp.cumsum((c[:, 0] * 100).astype(jnp.int32)))
slope("gather S rows @1.1M", lambda ids, c: jnp.take(
    jnp.cumsum(c, axis=0), jnp.arange(m) % n, axis=0), k_lo=1, k_hi=3)
cplx = cot[:, 0] + 1j * cot[:, 1]


def complex_scatter(ids, c):
    z = c[:, 0] + 1j * c[:, 1]
    return jnp.zeros(m, jnp.complex64).at[ids].add(z).real


slope("complex64 rank1 scatter", complex_scatter)


# ---- assembled pipeline: sort + cumsum + histogram + boundary gathers ----
@jax.jit
def seg_pipeline(ids, c):
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    rows = jnp.take(c, order, axis=0)
    S = jnp.cumsum(rows, axis=0)                      # inclusive
    S = jnp.concatenate([jnp.zeros((1, 7), jnp.float32), S], axis=0)
    cnt = jnp.zeros(m, jnp.int32).at[ids].add(1)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(cnt)]).astype(jnp.int32)
    lo = jnp.take(S, start[:-1], axis=0)
    hi = jnp.take(S, start[1:], axis=0)
    return hi - lo


@jax.jit
def rank7(ids, c):
    outs = [jnp.zeros(m, jnp.float32).at[ids].add(c[:, j]) for j in range(7)]
    return jnp.stack(outs, axis=1)


timed("PIPELINE sort+cumsum+hist", seg_pipeline, ids_rand, cot)
timed("BASELINE rank1 x7", rank7, ids_rand, cot)
r1 = seg_pipeline(ids_rand, cot)
r2 = rank7(ids_rand, cot)
err = float(jnp.max(jnp.abs(r1 - r2)))
rel = float(jnp.max(jnp.abs(r1 - r2) / (jnp.abs(r2) + 1e-6)))
print(f"pipeline vs rank7: max abs err {err:.3e}  max rel {rel:.3e}")
