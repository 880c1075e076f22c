"""r6: does XLA:TPU lower scatter-add faster with indices_are_sorted=True?
If yes, the bwd segment-reduce histogram (9 ms on unsorted ids) can run on
the already-sorted ids for near-free."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
print(jax.devices(), file=sys.stderr)
n, n_out = 1 << 20, 1_062_524
rng = np.random.default_rng(0)
lids = [np.sort(rng.integers(0, n_out, n).astype(np.int32))
        for _ in range(7)]
lids_u = [rng.permutation(l) for l in lids]


@partial(jax.jit, static_argnames=("sorted_",))
def hist(lid, sorted_):
    ones = jnp.ones_like(lid)
    z = jnp.zeros(n_out, jnp.int32)
    out = z.at[lid].add(ones, indices_are_sorted=sorted_)
    return jnp.sum(out * out)


for name, data, flag in (("unsorted ids, flag False", lids_u, False),
                         ("sorted ids, flag False", lids, False),
                         ("sorted ids, flag True", lids, True)):
    arrs = [jnp.asarray(a) for a in data]
    for _ in range(4):
        float(hist(arrs[-1], flag))
    t0 = time.time()
    for i in range(6):
        hist(arrs[i], flag)
    float(hist(arrs[0], flag))
    dt = (time.time() - t0) / 7
    print(f"hist {name}: {dt*1e3:7.2f} ms", flush=True)

# value scatter at boundaries on sorted indices (the full replacement for
# hist+cumsum-take: scatter per-segment sums at run-last rows, zeros
# elsewhere, indices sorted)
C = 7
cols = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))


@partial(jax.jit, static_argnames=("mode",))
def seg_scatter(srt, cols, mode):
    S = jnp.cumsum(cols, axis=0)
    nxt = jnp.concatenate([srt[1:], jnp.full(1, -1, jnp.int32)])
    is_last = srt != nxt
    # segment sum at last row = S[i] - S[prev_last]; prev_last via where
    prev = jnp.concatenate([jnp.zeros((1, C), jnp.float32),
                            jnp.where(is_last[:-1, None], S[:-1], 0)])
    # running subtract trick: cumsum of (masked) deltas — for the timing
    # probe just scatter S deltas; exactness variant lives in diff.py if
    # this wins
    vals = jnp.where(is_last[:, None], S - prev, 0.0)
    out = jnp.zeros((n_out, C), jnp.float32).at[srt].add(
        vals, indices_are_sorted=(mode == "sorted"))
    return jnp.sum(out)


for mode in ("plain", "sorted"):
    srts = [jnp.asarray(a) for a in lids]
    for _ in range(4):
        float(seg_scatter(srts[-1], cols, mode))
    t0 = time.time()
    for i in range(6):
        seg_scatter(srts[i], cols, mode)
    float(seg_scatter(srts[0], cols, mode))
    dt = (time.time() - t0) / 7
    print(f"row-scatter (N,7) {mode}: {dt*1e3:7.2f} ms", flush=True)
# measured 2026-08-22 (TPU v5 lite): hist unsorted 10.38 / sorted 12.60 /
# sorted+flag 12.54 ms; row-scatter plain 48.21 / sorted-flag 48.05 ms.
# indices_are_sorted does NOT change the XLA:TPU scatter lowering here;
# the 9-10 ms scalar-scatter histogram is the floor. (Sorted ids are even
# slightly slower — the serialized scatter walks the same rows either way.)
