"""Round-4 walker sweep: (walker, win, chunk) x {trace, fb} at 1024^2
depth-10 terrain, device-resident perturbed inputs (no eager math in the
timed loop)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
walker = os.environ.get("R4_WALKER", "window")
win = int(os.environ.get("R4_WIN", "4"))
os.environ["RTT_TILE_WALKER"] = walker
os.environ["RTT_TILE_WIN"] = str(win)

import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu import build_svo, get_scene
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera

print(jax.devices(), "walker:", walker, "win:", win, file=sys.stderr)
depth, res_px = 10, 1024
iters = int(os.environ.get("R4_ITERS", "5"))
k_max = int(os.environ.get("R4_K", "96"))
chunks = [int(c) for c in os.environ.get("R4_CHUNKS", "64,128,256").split(",")]

svo = _ckpt.load_svo(f"/tmp/bench_svo_terrain_d{depth}.npz")
tsvo = tile_mod.make_tile_svo(svo).device()

cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=res_px, height=res_px)
o, d, corners, _grid = tile_mod.tile_rays(cam, np)
n = o.shape[0] * o.shape[1]
# pre-perturbed device-resident inputs (defeats result caching, no eager
# work in the timed loop)
o_vars = [jnp.asarray(o * (1.0 + 1e-7 * i)) for i in range(iters + 1)]
d = jnp.asarray(d); corners = jnp.asarray(corners)


def fence(res):
    r, un = res
    return float(jnp.sum(r.hit_t) + jnp.sum(un))


for chunk in chunks:
    for name, fn in (
        ("trace", lambda ov, c=chunk: tile_mod.trace_tile(
            tsvo, ov, d, corners, k_max=k_max, chunk_tiles=c)),
        ("fb   ", lambda ov, c=chunk: tile_mod.trace_tile_fb(
            tsvo, ov, d, corners, k_max=k_max, chunk_tiles=c)),
    ):
        t0 = time.time()
        r = fn(o_vars[-1])
        un = int(jnp.sum(r[1]))
        wu = time.time() - t0
        t0 = time.time()
        for i in range(iters):
            fence(fn(o_vars[i]))
        dt = (time.time() - t0) / iters
        print(f"chunk={chunk:4d} {name}: {dt*1e3:8.1f} ms "
              f"{n/dt/1e6:6.1f} Mrays/s  un={un}  (warmup {wu:.1f}s)",
              flush=True)
