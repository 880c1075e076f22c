"""Micro: true cost of while_loop iterations on the TPU (fenced).

Measures per-iteration wall cost of a lax.while_loop whose body does
ELEM elementwise ops and optionally one row-gather from a table, at
several batch widths. All timings fenced by a host transfer.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

print(f"# devices: {jax.devices()}", file=sys.stderr)

ITERS = 256


@partial(jax.jit, static_argnames=("width", "elem", "table_rows", "unroll"))
def loop(x0, table, *, width, elem, table_rows, unroll):
    def cond(c):
        i, x, acc = c
        return i < ITERS

    def body(c):
        i, x, acc = c
        for _ in range(unroll):
            for _ in range(elem):
                x = x * 1.000001 + 0.5
                x = x - jnp.floor(x)
            if table_rows:
                idx = (jax.lax.bitcast_convert_type(x, jnp.int32)
                       & (table_rows - 1))
                acc = acc + jnp.take(table, idx, axis=0)
        return i + unroll, x, acc

    i, x, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), x0,
                                                jnp.zeros_like(x0)))
    return x, acc


def run(width, elem, table_rows, unroll=1):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (width,), jnp.float32)
    table = jnp.zeros((max(table_rows, 1),), jnp.float32)
    f = lambda: loop(x0, table, width=width, elem=elem,
                     table_rows=table_rows, unroll=unroll)
    t0 = time.time()
    r = f()
    float(jnp.sum(r[0]) + jnp.sum(r[1]))
    comp = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        r = f()
        float(jnp.sum(r[0]) + jnp.sum(r[1]))
    dt = (time.time() - t0) / reps
    per_it = dt / ITERS
    print(f"w={width:8d} elem={elem:3d} gather={table_rows:8d} unroll={unroll}"
          f"  compile={comp:5.1f}s  {dt*1e3:8.2f} ms/loop "
          f" {per_it*1e6:8.1f} us/iter  {per_it/width*1e12:7.2f} ps/ray/iter",
          flush=True)


# per-iteration overhead vs width (pure elementwise)
run(65536, 8, 0)
run(262144, 8, 0)
run(1048576, 8, 0)
# more work per iteration (does it fold into overhead?)
run(65536, 64, 0)
run(262144, 64, 0)
# gathers: small vs large table
run(65536, 8, 16384)
run(65536, 8, 1 << 20)
run(262144, 8, 1 << 20)
# unroll effect
run(65536, 8, 0, unroll=8)
run(65536, 8, 16384, unroll=8)
