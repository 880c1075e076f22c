"""Round-3 probe: settle the Pallas/Mosaic lowering question with artifacts.

Questions (VERDICT r02 item 1):
  P1  does a loop INSIDE a Pallas kernel escape the ~100-220us/iteration
      cost that lax.while_loop pays on this backend?
  P2  which gather formulations lower in Mosaic on jax 0.9.0 / this libtpu:
      a) jnp.take(table_1d, idx2d)            -- the claimed blocker
      b) jnp.take(table_2d, idx2d, axis=0)    -- row gather, 2D operand
      c) jnp.take_along_axis(x, i, axis=-1)   -- same-shape lane gather
      d) one-hot matmul gather                -- MXU fallback
  P3  XLA fori_loop vs while_loop per-iteration cost (is the overhead
      while_loop-specific?).

All timings host-fenced (float() of a reduction). Errors are captured and
printed, not raised.
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

ITERS = 256


def fence(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.float32)) for a in arrs))


def timed(name, f, reps=3):
    try:
        t0 = time.time()
        r = f()
        fence(*(r if isinstance(r, (tuple, list)) else (r,)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r = f()
            fence(*(r if isinstance(r, (tuple, list)) else (r,)))
        dt = (time.time() - t0) / reps
        print(f"OK   {name:42s} compile={comp:6.1f}s  run={dt*1e3:9.3f} ms"
              f"  ({dt/ITERS*1e6:8.2f} us/iter)", flush=True)
        return dt
    except Exception as e:
        msg = "".join(traceback.format_exception_only(type(e), e))[:2000]
        print(f"FAIL {name}\n     {msg}", flush=True)
        return None


# ---------------------------------------------------------------- P1: loop in kernel
def p1_kernel_loop(width_rows=512, elem=8):
    """fori_loop(ITERS) of `elem` vector ops on a (width_rows,128) VMEM block."""
    shape = (width_rows, 128)

    def kernel(x_ref, o_ref):
        def body(i, x):
            for _ in range(elem):
                x = x * 1.000001 + 0.5
                x = x - jnp.floor(x)
            return x
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.linspace(0, 1, shape[0] * shape[1]).reshape(shape).astype(jnp.float32)
    timed(f"P1 pallas fori x{ITERS} rows={width_rows} elem={elem}",
          lambda: run(x))


# ---------------------------------------------------------------- P2: gathers in kernel
def p2a_take_1d(rows=16384):
    """The claimed blocker: per-lane gather from a shared 1D table."""
    shape = (8, 128)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t = jnp.arange(rows, dtype=jnp.int32)
    i = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(shape) * 7919) % rows
    timed(f"P2a take(table[{rows}], idx2d)", lambda: run(t, i), reps=1)


def p2b_take_2d_axis0(rows=16384):
    """Row gather from 2D table: out[s,l] = table[idx[s,l], l]."""
    shape = (8, 128)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    i = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(shape) * 7919) % rows
    timed(f"P2b take_along_axis(table[{rows},128], idx[8,128], axis=0)",
          lambda: run(t, i), reps=1)


def p2c_take_along_lane():
    """Same-shape lane gather: out[s,l] = x[s, idx[s,l]]."""
    shape = (8, 128)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(shape)
    i = (x * 13) % 128
    timed("P2c take_along_axis(x[8,128], idx[8,128], axis=1)",
          lambda: run(x, i), reps=1)


def p2d_onehot(rows=4096):
    """MXU gather: one_hot(idx, rows) @ table."""
    shape = (8, 128)

    def kernel(t_ref, i_ref, o_ref):
        idx = i_ref[:].reshape(-1, 1)                      # (1024,1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8 * 128, rows), 1)
        oh = (cols == idx).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, t_ref[:],
                           preferred_element_type=jnp.float32).reshape(shape)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t = jnp.arange(rows, dtype=jnp.float32).reshape(rows, 1)
    i = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(shape) * 7919) % rows
    timed(f"P2d one-hot matmul gather rows={rows}", lambda: run(t, i), reps=1)


def p2e_take_2d_big(rows=16384, reps_in_kernel=64):
    """P2b in a loop — per-gather steady cost if it lowers."""
    shape = (8, 128)

    def kernel(t_ref, i_ref, o_ref):
        def body(k, acc):
            idx = (i_ref[:] + k) % rows
            return acc + jnp.take_along_axis(t_ref[:], idx, axis=0)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros(shape, jnp.int32))

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    i = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(shape) * 7919) % rows
    timed(f"P2e looped row-gather x{ITERS} rows={rows}", lambda: run(t, i))


# ---------------------------------------------------------------- P3: XLA loop kinds
def p3_xla_loops(width=65536, elem=8):
    def body_ops(x):
        for _ in range(elem):
            x = x * 1.000001 + 0.5
            x = x - jnp.floor(x)
        return x

    @jax.jit
    def wloop(x):
        def cond(c):
            return c[0] < ITERS
        def body(c):
            return c[0] + 1, body_ops(c[1])
        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    @jax.jit
    def floop(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, x: body_ops(x), x)

    @jax.jit
    def sloop(x):
        return jax.lax.scan(lambda x, _: (body_ops(x), None), x,
                            None, length=ITERS)[0]

    x = jnp.linspace(0, 1, width).astype(jnp.float32)
    timed(f"P3 XLA while_loop x{ITERS} w={width}", lambda: wloop(x))
    timed(f"P3 XLA fori_loop  x{ITERS} w={width}", lambda: floop(x))
    timed(f"P3 XLA scan       x{ITERS} w={width}", lambda: sloop(x))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "p1"):
        p1_kernel_loop()
    if which in ("all", "p2"):
        p2a_take_1d()
        p2b_take_2d_axis0()
        p2c_take_along_lane()
        p2d_onehot()
        p2e_take_2d_big()
    if which in ("all", "p3"):
        p3_xla_loops()
