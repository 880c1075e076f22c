"""Round-3 probe 3: XLA gather throughput characterization on the chip.

The traversal hot path is gather-bound (probe2: a 1M-row gather from a
512K-row table costs ~7.5 ms => ~7.5 ns/row; loop overhead is only ~7 us/iter).
This probe maps the gather cost surface:
  G1  one gather op of W rows  vs  k gather ops of W/k rows (issue overlap)
  G2  row width: u8 / u32 / 2xu32 / 16xu32 (the brick row)
  G3  dependent chain (addr depends on previous gather) -- the true
      traversal shape -- at several widths
  G4  table size sweep at fixed width
All fenced by float() reductions; fixed ~25 ms dispatch cost cancels in
slopes (ITERS differencing).
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

print(f"# jax {jax.__version__} devices {jax.devices()}", file=sys.stderr)


def bench(f, reps=3):
    r = f()
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in
              (r if isinstance(r, (tuple, list)) else (r,))))
    t0 = time.time()
    for _ in range(reps):
        r = f()
        float(sum(jnp.sum(a.astype(jnp.float32)) for a in
                  (r if isinstance(r, (tuple, list)) else (r,))))
    return (time.time() - t0) / reps


@partial(jax.jit, static_argnames=("iters", "splits", "width"))
def g_independent(idx0, table, *, iters, splits, width):
    """Per loop iteration: `splits` gather ops totalling `width` rows,
    addresses scrambled per iteration (independent of gathered values)."""
    rows = table.shape[0]

    def body(i, acc):
        idx = (idx0 * (i + 1)) % rows
        if splits == 1:
            g = jnp.take(table, idx, axis=0)
        else:
            w = width // splits
            parts = [jnp.take(table, jax.lax.dynamic_slice_in_dim(idx, j * w, w),
                              axis=0) for j in range(splits)]
            g = jnp.concatenate(parts)
        return acc + g.reshape(width, -1).sum(axis=1, dtype=jnp.int32)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros(width, jnp.int32))


@partial(jax.jit, static_argnames=("iters", "width"))
def g_dependent(idx0, table, *, iters, width):
    """Dependent chain: next address derived from gathered value."""
    rows = table.shape[0]

    def body(i, c):
        idx, acc = c
        g = jnp.take(table, idx, axis=0)
        v = g.reshape(width, -1)[:, 0]
        return (v + i) % rows, acc + v
    return jax.lax.fori_loop(
        0, iters, body, (idx0, jnp.zeros(width, jnp.int32)))[1]


def slope(f, i_lo, i_hi):
    a = bench(partial(f, iters=i_lo))
    b = bench(partial(f, iters=i_hi))
    return (b - a) / (i_hi - i_lo)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)

    if which in ("all", "g1"):
        rows = 1 << 19
        width = 1 << 20
        table = jnp.arange(rows, dtype=jnp.int32) % 1000
        idx0 = jax.random.randint(key, (width,), 0, rows, jnp.int32)
        for splits in (1, 2, 4, 8, 16):
            f = lambda iters, s=splits: g_independent(
                idx0, table, iters=iters, splits=s, width=width)
            s = slope(f, 8, 64)
            print(f"G1 splits={splits:2d} w=1M tbl=512K: "
                  f"{s*1e3:8.3f} ms/gather-iter = {s/width*1e9:6.2f} ns/row",
                  flush=True)

    if which in ("all", "g2"):
        rows = 1 << 16
        width = 1 << 20
        idx0 = jax.random.randint(key, (width,), 0, rows, jnp.int32)
        for ncol, dt in ((1, jnp.int8), (1, jnp.int32), (2, jnp.int32),
                         (4, jnp.int32), (16, jnp.int32)):
            table = jnp.ones((rows, ncol), dt) if ncol > 1 else \
                jnp.ones((rows,), dt)
            f = lambda iters, t=table: g_independent(
                idx0, t, iters=iters, splits=1, width=width)
            s = slope(f, 8, 64)
            nb = ncol * np.dtype(dt.dtype if hasattr(dt, 'dtype') else
                                 np.int32).itemsize if ncol > 1 else \
                np.dtype(np.int8 if dt is jnp.int8 else np.int32).itemsize
            print(f"G2 row={ncol}x{dt.__name__:5s} w=1M tbl=64K: "
                  f"{s*1e3:8.3f} ms/iter = {s/width*1e9:6.2f} ns/row",
                  flush=True)

    if which in ("all", "g3"):
        rows = 1 << 16
        table = (jnp.arange(rows, dtype=jnp.int32) * 40503) % rows
        for width in (1 << 13, 1 << 16, 1 << 18, 1 << 20):
            idx0 = jax.random.randint(key, (width,), 0, rows, jnp.int32)
            f = lambda iters, w=width, i=idx0: g_dependent(
                i, table, iters=iters, width=w)
            s = slope(f, 8, 64)
            print(f"G3 dependent w={width:8d} tbl=64K: "
                  f"{s*1e3:8.3f} ms/iter = {s/width*1e9:6.2f} ns/row",
                  flush=True)

    if which in ("all", "g4"):
        width = 1 << 16
        idx_base = jax.random.randint(key, (width,), 0, 1 << 30, jnp.int32)
        for lr in (10, 13, 16, 19, 22):
            rows = 1 << lr
            table = jnp.ones((rows,), jnp.int32)
            idx0 = idx_base % rows
            f = lambda iters, t=table, i=idx0: g_independent(
                i, t, iters=iters, splits=1, width=width)
            s = slope(f, 8, 64)
            print(f"G4 tbl={rows:8d} rows ({rows*4//1024:6d} KB) w=64K: "
                  f"{s*1e3:8.3f} ms/iter = {s/width*1e9:6.2f} ns/row",
                  flush=True)


if __name__ == "__main__":
    main()
