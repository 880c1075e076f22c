"""Round-3 probe 2: dynamic_gather sublane limits + true loop slope costs.

Findings from probe_kernel.py: ~25 ms FIXED cost per dispatch+fence round
trip on the axon tunnel (a 256-iter pallas loop, a single tiny gather
kernel, and 256-iter XLA loops all cost ~25 ms). r02's "~100-220 us/iter
while_loop overhead" was this fixed cost divided by 256. This probe
separates slope from intercept.
"""
import sys
import time
import traceback
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"# jax {jax.__version__} devices {jax.devices()}", file=sys.stderr)


def fence(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.float32)) for a in arrs))


def bench(f, reps=3):
    r = f()
    fence(*(r if isinstance(r, (tuple, list)) else (r,)))
    t0 = time.time()
    for _ in range(reps):
        r = f()
        fence(*(r if isinstance(r, (tuple, list)) else (r,)))
    return (time.time() - t0) / reps


def try_run(name, f, reps=3):
    try:
        dt = bench(f, reps)
        print(f"OK   {name:56s} {dt*1e3:9.3f} ms", flush=True)
        return dt
    except Exception as e:
        msg = "".join(traceback.format_exception_only(type(e), e))[:800]
        print(f"FAIL {name}\n     {msg}", flush=True)
        return None


# ---------------------------------------------------------- sublane gather limit
def gather_axis0(rows, dtype=jnp.int32):
    shape = (rows, 128)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t = jnp.arange(rows * 128, dtype=dtype).reshape(shape)
    i = ((jnp.arange(rows * 128, dtype=jnp.int32).reshape(shape) * 7919)
         % rows)
    # correctness check too
    def check():
        out = run(t, i)
        exp = jnp.take_along_axis(t, i, axis=0)
        ok = bool(jnp.all(out == exp))
        if not ok:
            raise AssertionError("WRONG RESULT")
        return out
    try_run(f"gather axis0 same-shape rows={rows} {dtype.__name__}",
            check, reps=1)


# ---------------------------------------------------------- loop slope, pallas
def pallas_loop_slope(rows, elem, iters, gather_rows=0):
    shape = (rows, 128)

    def kernel(x_ref, t_ref, i_ref, o_ref):
        def body(k, x):
            for _ in range(elem):
                x = x * 1.000001 + 0.5
                x = x - jnp.floor(x)
            if gather_rows:
                idx = (jax.lax.bitcast_convert_type(x, jnp.int32)
                       & (gather_rows - 1))
                idx = jnp.clip(idx, 0, rows - 1) if gather_rows > rows else idx
                # per-lane gather from lane-replicated table
                g = jnp.take_along_axis(t_ref[:], idx, axis=0)
                x = x + g * 1e-9
            return x
        o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    @jax.jit
    def run(x, t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, t, i)

    x = jnp.linspace(0, 1, rows * 128).reshape(shape).astype(jnp.float32)
    t = jnp.zeros(shape, jnp.float32)
    i = jnp.zeros(shape, jnp.int32)
    return try_run(
        f"pallas loop rows={rows} elem={elem} iters={iters} g={gather_rows}",
        lambda: run(x, t, i))


# ---------------------------------------------------------- loop slope, XLA
def xla_loop_slope(width, elem, iters, table_rows=0):
    @jax.jit
    def floop(x, table):
        def body(i, c):
            x, acc = c
            for _ in range(elem):
                x = x * 1.000001 + 0.5
                x = x - jnp.floor(x)
            if table_rows:
                idx = (jax.lax.bitcast_convert_type(x, jnp.int32)
                       & (table_rows - 1))
                acc = acc + jnp.take(table, idx, axis=0)
            return x, acc
        return jax.lax.fori_loop(0, iters, body, (x, jnp.zeros_like(x)))

    x = jnp.linspace(0, 1, width).astype(jnp.float32)
    table = jnp.zeros((max(table_rows, 1),), jnp.float32)
    return try_run(
        f"XLA fori w={width} elem={elem} iters={iters} tbl={table_rows}",
        lambda: floop(x, table))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "g"):
        for rows in (8, 16, 32, 64, 256, 1024):
            gather_axis0(rows)
    if which in ("all", "pl"):
        # slope: same kernel at 64 vs 2048 iters
        a = pallas_loop_slope(512, 8, 64)
        b = pallas_loop_slope(512, 8, 2048)
        if a and b:
            print(f"  -> pallas per-iter slope (64K lanes, 8 elem): "
                  f"{(b-a)/(2048-64)*1e6:.2f} us/iter")
        c = pallas_loop_slope(512, 8, 64, gather_rows=512)
        d = pallas_loop_slope(512, 8, 2048, gather_rows=512)
        if c and d:
            print(f"  -> pallas per-iter slope with 512-row gather: "
                  f"{(d-c)/(2048-64)*1e6:.2f} us/iter")
    if which in ("all", "xla"):
        a = xla_loop_slope(1048576, 8, 64)
        b = xla_loop_slope(1048576, 8, 2048)
        if a and b:
            print(f"  -> XLA per-iter slope (1M wide, 8 elem): "
                  f"{(b-a)/(2048-64)*1e6:.2f} us/iter")
        c = xla_loop_slope(1048576, 8, 64, table_rows=1 << 19)
        d = xla_loop_slope(1048576, 8, 2048, table_rows=1 << 19)
        if c and d:
            print(f"  -> XLA per-iter slope with 512K-row gather: "
                  f"{(d-c)/(2048-64)*1e6:.2f} us/iter")
