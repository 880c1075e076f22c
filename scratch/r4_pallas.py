"""Pallas tile-walk feasibility repros (VERDICT r03 item 6).

The window walker's kernel form needs, per iteration and per tile:
  (a) a scalar per-tile cursor (SMEM) driving
  (b) a dynamic (1,16) row load from a VMEM-resident table, and
  (c) a vector->scalar reduction (min over the tile's per-ray cursors)
      feeding back into (a).
This probe tests each primitive's Mosaic lowering on the real backend,
smallest first. Outcome (either way) goes to PROFILE.md."""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print(jax.devices(), file=sys.stderr)


def try_run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


# (b) dynamic row load from a VMEM table, index from an SMEM scalar
def k_dynrow(idx_ref, table_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = table_ref[pl.ds(i, 1), :]   # (1,128)


def dynrow():
    table = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.asarray([17], jnp.int32)
    return pl.pallas_call(
        k_dynrow,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if False else None),
                  pl.BlockSpec((64, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(idx, table)


# (b') same but via SMEM scalar-prefetch grid spec
from jax.experimental.pallas import tpu as pltpu


def k_dynrow2(idx_ref, table_ref, o_ref):
    i = idx_ref[0]
    o_ref[...] = table_ref[pl.ds(i, 1), :]


def dynrow2():
    table = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.asarray([17], jnp.int32)
    return pl.pallas_call(
        k_dynrow2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, s: (0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda i, s: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(idx, table)


# (b'') dynamic row load with a TRACED index (from a vector reduction)
def k_dynrow3(table_ref, cur_ref, o_ref):
    m = jnp.min(cur_ref[...])                 # vector -> scalar
    o_ref[...] = table_ref[pl.ds(m, 1), :]


def dynrow3():
    table = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    cur = jnp.full((8, 128), 9, jnp.int32)
    return pl.pallas_call(
        k_dynrow3,
        grid=(1,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (0, 0)),
                  pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(table, cur)


# (c) per-sublane dynamic row select: 8 different rows for 8 tiles
def k_dynrow8(table_ref, idx_ref, o_ref):
    rows = []
    for t in range(8):
        i = idx_ref[t, 0]
        rows.append(table_ref[pl.ds(i, 1), :])
    o_ref[...] = jnp.concatenate(rows, axis=0)


def dynrow8():
    table = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = (jnp.arange(8, dtype=jnp.int32) * 3).reshape(8, 1)
    return pl.pallas_call(
        k_dynrow8,
        grid=(1,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (0, 0)),
                  pl.BlockSpec((8, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(table, idx)


ok_b = try_run("dynrow (VMEM table, SMEM-ish idx)", dynrow)
ok_b2 = try_run("dynrow2 (scalar prefetch)", dynrow2)
ok_b3 = try_run("dynrow3 (traced reduction idx)", dynrow3)
ok_b8 = try_run("dynrow8 (8 per-tile rows)", dynrow8)
