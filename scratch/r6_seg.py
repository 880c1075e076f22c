"""r6: backward segment-reduce boundary-offset alternatives at the bench
shapes (1M rows -> 1.06M leaves). Verdict: the scalar scatter-add histogram
stays — searchsorted(method='sort') replaces the 9 ms scatter with a ~2.1M
single-column merged sort that costs MORE (megasorts are not free; the
phase-1 'sorts are free' evidence is about wide multi-row sorts)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
print(jax.devices(), file=sys.stderr)
n, n_out, C = 1 << 20, 1_062_524, 7
rng = np.random.default_rng(0)
cols = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))


@partial(jax.jit, static_argnames=("mode",))
def seg(lid, cols, mode):
    order = jnp.argsort(lid)
    srt = jnp.take(lid, order)
    rows = jnp.take(cols, order, axis=0)
    S = jnp.cumsum(rows, axis=0)
    S = jnp.concatenate([jnp.zeros((1, C), cols.dtype), S], axis=0)
    if mode == "hist":
        cnt = jnp.zeros(n_out, jnp.int32).at[lid].add(1)
        start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)])
    else:
        start = jnp.searchsorted(srt, jnp.arange(n_out + 1, dtype=jnp.int32),
                                 side="left", method="sort").astype(jnp.int32)
    G = jnp.take(S, start, axis=0)
    return jnp.sum(G[1:] - G[:-1])


lids = [jnp.asarray(rng.integers(0, n_out, n).astype(np.int32))
        for _ in range(7)]
for mode in ("hist", "sort", "hist", "sort"):
    for _ in range(4):
        float(seg(lids[-1], cols, mode))
    t0 = time.time()
    for i in range(6):
        seg(lids[i], cols, mode)
    float(seg(lids[0], cols, mode))
    dt = (time.time() - t0) / 7
    print(f"seg {mode}: {dt*1e3:7.2f} ms", flush=True)
# measured 2026-08-22: hist 22.10 / sort 45.95 / hist 22.12 / sort 46.41 ms
