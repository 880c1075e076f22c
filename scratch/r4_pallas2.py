"""Pallas vs XLA for the tile walker's hot body (VERDICT r03 item 6).

The walk body is gather-free vector math (the candidate loads are ~free
VMEM reads; scratch/r4_pallas.py proved every needed dynamic-indexing
primitive lowers). So the question 'would a Pallas walk beat the XLA walk'
reduces to: does Mosaic execute the DDA step sequence faster per lane than
XLA's fusion of the identical ops? This measures 16 unrolled exact DDA
steps over pre-staged per-ray state at production width, same formulas,
both backends."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print(jax.devices(), file=sys.stderr)

N = 1 << 16            # rays per program invocation (64K, one walk chunk)
STEPS = 16
S_MAX = 23
DEPTH = 10
VSHIFT = S_MAX - DEPTH
VSIZE = np.float32(2.0 ** -DEPTH)


def _spread3(x):
    return (x & 1) | ((x & 2) << 2) | ((x & 4) << 4)


def dda_steps(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    """16 exact DDA steps; rw (16, N) u32 words, per-ray columns."""
    hit_idx9 = jnp.zeros_like(t_cur, dtype=jnp.int32)
    for _ in range(STEPS):
        li = (jax.lax.bitcast_convert_type(bpos, jnp.int32) >> VSHIFT) & 7
        aa = li ^ flip
        idx9 = (_spread3(aa[..., 0]) | (_spread3(aa[..., 1]) << 1)
                | (_spread3(aa[..., 2]) << 2))
        wsel = idx9 >> 5
        bitpos = (idx9 & 31).astype(jnp.uint32)
        acc = jnp.zeros_like(wsel, dtype=jnp.uint32)
        for j in range(16):
            acc = acc | jnp.where(wsel == j, rw[j], jnp.uint32(0))
        occ = ((acc >> bitpos) & 1) != 0
        hit_now = walking & occ & (t_cur < hit_t)
        t_corner = bpos * tc - tb
        tc_max = jnp.min(t_corner, axis=-1)
        adv = walking & ~hit_now
        step_bits = t_corner <= tc_max[..., None]
        exit_b = adv & jnp.any(step_bits & (li == 0), axis=-1)
        stay = adv & ~exit_b
        bpos = bpos - jnp.where(step_bits & stay[..., None], VSIZE,
                                np.float32(0.0))
        t_cur = jnp.where(adv, jnp.maximum(t_cur, tc_max), t_cur)
        walking = stay
        hit_t = jnp.where(hit_now, t_cur, hit_t)
        hit_idx9 = jnp.where(hit_now, idx9, hit_idx9)
    return hit_t, hit_idx9, t_cur


def kernel(bpos_ref, t_cur_ref, walking_ref, rw_ref, tc_ref, tb_ref,
           flip_ref, hit_t_ref, o_ht_ref, o_idx_ref, o_tc_ref):
    ht, hidx, tcur = dda_steps(
        bpos_ref[...], t_cur_ref[...], walking_ref[...] != 0, rw_ref[...],
        tc_ref[...], tb_ref[...], flip_ref[...], hit_t_ref[...])
    o_ht_ref[...] = ht
    o_idx_ref[...] = hidx
    o_tc_ref[...] = tcur


def make_inputs(key):
    ks = jax.random.split(key, 8)
    bpos = 1.0 + jax.random.uniform(ks[0], (N, 3), jnp.float32) * 0.9
    t_cur = jax.random.uniform(ks[1], (N,), jnp.float32)
    walking = jax.random.bernoulli(ks[2], 0.7, (N,))
    rw = jax.random.randint(ks[3], (16, N), 0, 2**31 - 1,
                            jnp.int32).astype(jnp.uint32)
    tc = -1.0 - jax.random.uniform(ks[4], (N, 3), jnp.float32)
    tb = jax.random.uniform(ks[5], (N, 3), jnp.float32)
    flip = jax.random.randint(ks[6], (N, 3), 0, 2, jnp.int32) * 7
    hit_t = jnp.full((N,), jnp.inf, jnp.float32)
    return bpos, t_cur, walking, rw, tc, tb, flip, hit_t


@jax.jit
def xla_version(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    return dda_steps(bpos, t_cur, walking, rw, tc, tb, flip, hit_t)


BLK = 2048


@jax.jit
def pallas_version(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    g = N // BLK
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLK,), lambda i: (i,)),
            pl.BlockSpec((BLK,), lambda i: (i,)),
            pl.BlockSpec((16, BLK), lambda i: (0, i)),
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLK,), lambda i: (i,)),
        ],
        out_specs=[pl.BlockSpec((BLK,), lambda i: (i,)),
                   pl.BlockSpec((BLK,), lambda i: (i,)),
                   pl.BlockSpec((BLK,), lambda i: (i,))],
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.float32),
                   jax.ShapeDtypeStruct((N,), jnp.int32),
                   jax.ShapeDtypeStruct((N,), jnp.float32)],
    )(bpos, t_cur, walking.astype(jnp.int32), rw, tc, tb, flip, hit_t)


def bench(name, fn, args, reps=10, inner=8):
    # repeat the program inner x per timed call chain via perturbed t_cur
    outs = fn(*args)
    [float(jnp.sum(o)) for o in outs]
    for _ in range(5):
        outs = fn(*args)
        [float(jnp.sum(o)) for o in outs]
    t0 = time.time()
    allouts = []
    for r in range(reps):
        a = list(args)
        a[1] = a[1] * (1.0 + 1e-6 * r)
        allouts.append(fn(*a))
    acc = sum(float(jnp.sum(o)) for outs in allouts for o in outs)
    dt = (time.time() - t0) / reps
    per = dt / (N * STEPS) * 1e9
    print(f"{name:18s} {dt*1e3:7.2f} ms/call  {per:6.3f} ns/lane-step",
          flush=True)


args = make_inputs(jax.random.PRNGKey(0))
try:
    r_p = pallas_version(*args)
    r_x = xla_version(*args)
    same = (np.allclose(np.asarray(r_p[0]), np.asarray(r_x[0]))
            and np.array_equal(np.asarray(r_p[1]), np.asarray(r_x[1])))
    print("pallas == xla:", same, flush=True)
    bench("xla body", xla_version, args)
    bench("pallas body", pallas_version, args)
except Exception as e:
    print(f"PALLAS FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
    bench("xla body", xla_version, args)
