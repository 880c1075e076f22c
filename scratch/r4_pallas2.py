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
R = N // 128           # 2-D layout (R, 128): Mosaic wants >= 2-D operands
STEPS = 16
S_MAX = 23
DEPTH = 10
VSHIFT = S_MAX - DEPTH
VSIZE = np.float32(2.0 ** -DEPTH)


def _spread3(x):
    return (x & 1) | ((x & 2) << 2) | ((x & 4) << 4)


def dda_steps(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    """STEPS exact DDA steps; state (R,128)-shaped per component; rw is a
    tuple of 16 (R,128) u32 word planes; bpos/tc/tb/flip are 3-tuples."""
    bpos = list(bpos)
    hit_idx9 = jnp.zeros_like(t_cur, dtype=jnp.int32)
    for _ in range(STEPS):
        li = [(jax.lax.bitcast_convert_type(bpos[a], jnp.int32) >> VSHIFT)
              & 7 for a in range(3)]
        aa = [li[a] ^ flip[a] for a in range(3)]
        idx9 = (_spread3(aa[0]) | (_spread3(aa[1]) << 1)
                | (_spread3(aa[2]) << 2))
        wsel = idx9 >> 5
        bitpos = (idx9 & 31).astype(jnp.uint32)
        acc = jnp.zeros_like(wsel, dtype=jnp.uint32)
        for j in range(16):
            acc = acc | jnp.where(wsel == j, rw[j], jnp.uint32(0))
        occ = ((acc >> bitpos) & 1) != 0
        hit_now = walking & occ & (t_cur < hit_t)
        t_corner = [bpos[a] * tc[a] - tb[a] for a in range(3)]
        tc_max = jnp.minimum(jnp.minimum(t_corner[0], t_corner[1]),
                             t_corner[2])
        adv = walking & ~hit_now
        step_bits = [t_corner[a] <= tc_max for a in range(3)]
        exit_b = adv & ((step_bits[0] & (li[0] == 0))
                        | (step_bits[1] & (li[1] == 0))
                        | (step_bits[2] & (li[2] == 0)))
        stay = adv & ~exit_b
        for a in range(3):
            bpos[a] = bpos[a] - jnp.where(step_bits[a] & stay, VSIZE,
                                          np.float32(0.0))
        t_cur = jnp.where(adv, jnp.maximum(t_cur, tc_max), t_cur)
        walking = stay
        hit_t = jnp.where(hit_now, t_cur, hit_t)
        hit_idx9 = jnp.where(hit_now, idx9, hit_idx9)
    return hit_t, hit_idx9, t_cur


def kernel(*refs):
    (bx, by, bz, t_cur_ref, walking_ref, rw_ref, tcx, tcy, tcz,
     tbx, tby, tbz, fx, fy, fz, hit_t_ref,
     o_ht_ref, o_idx_ref, o_tc_ref) = refs
    rw = [rw_ref[j] for j in range(16)]
    ht, hidx, tcur = dda_steps(
        (bx[...], by[...], bz[...]), t_cur_ref[...],
        walking_ref[...] != 0, rw,
        (tcx[...], tcy[...], tcz[...]), (tbx[...], tby[...], tbz[...]),
        (fx[...], fy[...], fz[...]), hit_t_ref[...])
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


def split3(x):
    return tuple(x[:, a].reshape(R, 128) for a in range(3))


@jax.jit
def xla_version(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    sh = lambda v: v.reshape(R, 128)
    return dda_steps(split3(bpos), sh(t_cur), sh(walking),
                     [sh(rw[j]) for j in range(16)], split3(tc), split3(tb),
                     split3(flip), sh(hit_t))


BLKR = 16           # (16,128) ray blocks = 2048 rays per grid step


@jax.jit
def pallas_version(bpos, t_cur, walking, rw, tc, tb, flip, hit_t):
    g = R // BLKR
    bs = pl.BlockSpec((BLKR, 128), lambda i: (i, 0))
    bsw = pl.BlockSpec((16, BLKR, 128), lambda i: (0, i, 0))
    sh = lambda v: v.reshape(R, 128)
    args = (list(split3(bpos)) + [sh(t_cur), sh(walking).astype(jnp.int32),
            jnp.stack([sh(rw[j]) for j in range(16)])]
            + list(split3(tc)) + list(split3(tb))
            + [f.astype(jnp.int32) for f in split3(flip)] + [sh(hit_t)])
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[bs, bs, bs, bs, bs, bsw, bs, bs, bs, bs, bs, bs, bs, bs,
                  bs, bs],
        out_specs=[bs, bs, bs],
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((R, 128), jnp.int32),
                   jax.ShapeDtypeStruct((R, 128), jnp.float32)],
    )(*args)


def bench(name, fn, args, reps=16):
    # reductions INSIDE one jit so each timed call returns 3 scalars (no
    # eager output reductions / array transfers in the timed loop)
    f = jax.jit(lambda *a: tuple(jnp.sum(o) for o in fn(*a)))
    pert = [list(args) for _ in range(reps)]
    for r in range(reps):
        pert[r][1] = args[1] * (1.0 + 1e-6 * r)
    for r in range(6):
        [float(v) for v in f(*pert[r % 3])]
    t0 = time.time()
    allouts = [f(*pert[r]) for r in range(reps)]
    acc = sum(float(v) for vs in allouts for v in vs)
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


# ---- per-argument dispatch overhead hypothesis: pack the 29 planes into
# ONE input array, unpack inside the jit ----
def pack_args(args):
    bpos, t_cur, walking, rw, tc, tb, flip, hit_t = args
    sh = lambda v: v.reshape(R, 128)
    f = jax.lax.bitcast_convert_type
    planes = (list(split3(bpos)) + [sh(t_cur),
              f(sh(walking).astype(jnp.int32), jnp.float32)]
              + [f(sh(rw[j]), jnp.float32) for j in range(16)]
              + list(split3(tc)) + list(split3(tb))
              + [f(split3(flip)[a].astype(jnp.int32), jnp.float32)
                 for a in range(3)] + [sh(hit_t)])
    return jnp.stack(planes)


@jax.jit
def xla_packed(P_):
    f = jax.lax.bitcast_convert_type
    bpos = (P_[0], P_[1], P_[2])
    t_cur = P_[3]
    walking = f(P_[4], jnp.int32) != 0
    rw = [f(P_[5 + j], jnp.uint32) for j in range(16)]
    tc = (P_[21], P_[22], P_[23])
    tb = (P_[24], P_[25], P_[26])
    flip = tuple(f(P_[27 + a - 0], jnp.int32) for a in range(3)) if False \
        else (f(P_[27], jnp.int32), f(P_[28], jnp.int32),
              f(P_[29], jnp.int32))
    hit_t = P_[30]
    outs = dda_steps(bpos, t_cur, walking, rw, tc, tb, flip, hit_t)
    return tuple(jnp.sum(o) for o in outs)


packed = pack_args(args)
print("packed planes:", packed.shape, flush=True)
for r in range(6):
    [float(v) for v in xla_packed(packed * (1.0 + 0.0))]
t0 = time.time()
outs = [xla_packed(packed) for _ in range(16)]
acc = sum(float(v) for vs in outs for v in vs)
dt = (time.time() - t0) / 16
print(f"xla packed (1 arg): {dt*1e3:7.2f} ms/call  "
      f"{dt/(N*STEPS)*1e9:6.3f} ns/lane-step", flush=True)
