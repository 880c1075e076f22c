"""Phase split of the tile forward: candidates-only vs walk-only vs full,
plus a k_max x fb sweep (smaller main-pass K shifts sort work into the
cheap enlarged-K re-walk)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera

print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
iters = 5
o_vars = [jnp.asarray(np.asarray(o) * (1.0 + 1e-7 * i))
          for i in range(iters + 1)]
c_vars = [jnp.asarray(np.asarray(corners) * (1.0 + 1e-7 * i))
          for i in range(iters + 1)]
apex = o[0, 0]
n = 1024 * 1024


@partial(jax.jit, static_argnames=("k_max", "chunk"))
def cands_only(corners_, apex_, k_max, chunk):
    caps = tile_mod._default_caps(tsvo.top_depth, k_max)
    T = corners_.shape[0]
    g = T // chunk
    out = jax.lax.map(
        lambda c: tile_mod._candidates(jnp.asarray(tsvo.pyr),
                                       jnp.asarray(tsvo.cellmap), c, apex_,
                                       tsvo.top_depth, caps, k_max),
        corners_.reshape(g, chunk, 4, 3))
    return sum(jnp.sum(x) for x in (out[1], out[3]))


def timeit(name, fn, *a):
    fn(*a)
    t0 = time.time()
    for i in range(iters):
        float(fn(*a))
    print(f"{name:36s} {(time.time()-t0)/iters*1e3:8.1f} ms", flush=True)


# absorb the first-timed-program session artifact on a throwaway
timeit("(session warm)", lambda c: cands_only(c, apex, 96, 256), c_vars[0])

for k in (96, 48, 32):
    timeit(f"candidates only k={k}",
           lambda c, k=k: cands_only(c, apex, k, 256), c_vars[1])


def full(k_max, fbt, fbk):
    def f(ov):
        r, un = tile_mod.trace_tile_fb(tsvo, ov, d, corners, k_max=k_max,
                                       chunk_tiles=256, fb_tiles=fbt,
                                       fb_k=fbk)
        return float(jnp.sum(r.hit_t) + jnp.sum(un))
    return f


for k, fbt, fbk in ((96, 256, 256), (48, 256, 256), (48, 512, 192),
                    (32, 512, 256), (64, 256, 256)):
    f = full(k, fbt, fbk)
    f(o_vars[-1])
    r, un = tile_mod.trace_tile_fb(tsvo, o_vars[-1], d, corners, k_max=k,
                                   chunk_tiles=256, fb_tiles=fbt, fb_k=fbk)
    nun = int(jnp.sum(un))
    t0 = time.time()
    for i in range(iters):
        f(o_vars[i])
    dt = (time.time() - t0) / iters
    print(f"full k={k:3d} fbt={fbt} fbk={fbk}: {dt*1e3:8.1f} ms "
          f"{n/dt/1e6:6.1f} Mrays/s residual={nun}", flush=True)
