# NOTE: p1_chunk was a one-session experiment; the parameter was removed
# from _trace_tile after measuring no win (chunked phase-1 stays).
"""r6: phase-1 chunking A/B (unchunked single pass vs per-walk-chunk lax.map)
and dda_unroll sweep at the bench config."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu import diff

print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
iters = 6; n = 1024 * 1024
o_vars = [jnp.asarray(np.asarray(o) * (1 + 1e-7 * i)) for i in range(iters + 1)]
caps = tile_mod._default_caps(tsvo.top_depth, 96)
pyr = jnp.asarray(tsvo.pyr); cm = jnp.asarray(tsvo.cellmap)
bricks = jnp.asarray(tsvo.bsvo.bricks)
apex = o[0, 0]


def timeit(name, fn):
    for _ in range(6):
        float(fn(o_vars[-1]))
    t0 = time.time()
    for i in range(iters):
        fn(o_vars[i])
    float(fn(o_vars[0]))
    dt = (time.time() - t0) / (iters + 1)
    print(f"{name:46s} {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s", flush=True)
    return dt


@partial(jax.jit, static_argnames=("p1", "du"))
def tr(ov, p1, du, k=96):
    res, un = tile_mod._trace_tile(pyr, cm, bricks, ov, d, corners, apex,
                                   tsvo.depth, tsvo.top_depth, caps, 96,
                                   256, dda_unroll=du, p1_chunk=p1)
    return jnp.sum(res.hit_t) + jnp.sum(un)


for p1 in (256, 0, 1024):
    timeit(f"trace p1_chunk={p1} du=8", lambda ov, p1=p1: tr(ov, p1=p1, du=8))
for du in (10, 12, 16):
    timeit(f"trace p1_chunk=0 du={du}", lambda ov, du=du: tr(ov, p1=0, du=du))

# parity: unchunked phase-1 must be bit-identical to chunked
a = np.asarray(jax.jit(lambda ov: tile_mod._trace_tile(
    pyr, cm, bricks, ov, d, corners, apex, tsvo.depth, tsvo.top_depth,
    caps, 96, 256, p1_chunk=256)[0].hit_t)(o))
b = np.asarray(jax.jit(lambda ov: tile_mod._trace_tile(
    pyr, cm, bricks, ov, d, corners, apex, tsvo.depth, tsvo.top_depth,
    caps, 96, 256, p1_chunk=0)[0].hit_t)(o))
print("p1 chunked == unchunked:", np.array_equal(a, b))
