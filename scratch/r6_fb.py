"""r6: the fb1 enlarged-K re-walk is the most expensive op in the forward
frame (while.182, ~20 ms device — MORE than the whole 16-chunk main walk,
r6_breakdown.py). Sweep its structure: fb_k, fb budgets, window params
(env: RTT_TILE_FB_WIN/LOADS/SKIPS), and an fb2-only variant.

Usage: python scratch/r6_fb.py [sweep|count]
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu import diff

print(jax.devices(), "FB_WIN/LOADS/SKIPS:", tile_mod.FB_WIN,
      tile_mod.FB_LOADS, tile_mod.FB_SKIPS, file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
albedo = jnp.asarray(svo.leaf_albedo); normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
iters = 6; n = 1024 * 1024
o_vars = [jnp.asarray(np.asarray(o) * (1 + 1e-7 * i)) for i in range(iters + 1)]


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


if sys.argv[1:] == ["count"]:
    # problem size: unresolved rays/tiles after the MAIN walk only
    res, un = tile_mod.trace_tile(tsvo, o, d, corners, k_max=96,
                                  chunk_tiles=256)
    un = np.asarray(un).reshape(4096, 256)
    print(f"unresolved rays after main walk: {un.sum()}, "
          f"tiles: {(un.any(axis=1)).sum()}")
    raise SystemExit


for k, fbt, fbk, fb2 in ((96, 96, 256, 16), (96, 96, 160, 16),
                         (96, 96, 128, 32), (96, 64, 160, 16),
                         (96, 0, 256, 96), (96, 0, 160, 96)):
    def fwd(ov, k=k, fbt=fbt, fbk=fbk, fb2=fb2):
        img, residual = diff.render_diff_tile(
            albedo, normal, density, tsvo, ov, d, corners, light,
            k_max=k, fb_tiles=fbt, fb_k=fbk, fb2_tiles=fb2)
        return jnp.sum(img) + residual
    timeit(f"fwd k={k} fbt={fbt} fbk={fbk} fb2={fb2}", fwd)
    img, res = diff.render_diff_tile(albedo, normal, density, tsvo, o, d,
                                     corners, light, k_max=k, fb_tiles=fbt,
                                     fb_k=fbk, fb2_tiles=fb2)
    print(f"   residual={int(res)}", flush=True)
