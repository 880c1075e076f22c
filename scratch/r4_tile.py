"""Round-4 forward walker A/B: window walker vs r3 lockstep walker, plus the
enlarged-K tile re-walk fallback vs no-fallback, at 1024^2 depth-10 terrain.

Env: R4_WALKER (window|lockstep), R4_WIN, R4_K, R4_CHUNK, R4_UNROLL, R4_ITERS.
Run separately per config (module-level walker constants)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
walker = os.environ.get("R4_WALKER", "window")
win = int(os.environ.get("R4_WIN", "4"))
os.environ["RTT_TILE_WALKER"] = walker
os.environ["RTT_TILE_WIN"] = str(win)

import jax, jax.numpy as jnp
from raytracingtest_tpu import build_svo, get_scene
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera

print(jax.devices(), "walker:", walker, "win:", win, file=sys.stderr)

depth = int(os.environ.get("R4_DEPTH", "10"))
res_px = int(os.environ.get("R4_RES", "1024"))
iters = int(os.environ.get("R4_ITERS", "6"))
k_max = int(os.environ.get("R4_K", "96"))
chunk = int(os.environ.get("R4_CHUNK", "256"))
fb_tiles = int(os.environ.get("R4_FBT", "256"))
fb_k = int(os.environ.get("R4_FBK", "256"))

cache = f"/tmp/bench_svo_terrain_d{depth}.npz"
if os.path.exists(cache):
    svo = _ckpt.load_svo(cache)
else:
    svo = build_svo(get_scene("terrain"), depth).svo
    _ckpt.save_svo(svo, cache)
tsvo = tile_mod.make_tile_svo(svo).device()
print(f"# depth={depth} nodes={svo.n_nodes}", file=sys.stderr)

cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=res_px, height=res_px)
o, d, corners, _grid = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
n = o.shape[0] * o.shape[1]


def fence(res):
    r, un = res
    return float(jnp.sum(r.hit_t) + jnp.sum(un))


def run_trace(eps):
    return tile_mod.trace_tile(tsvo, o * (1 + eps), d, corners, k_max=k_max,
                               chunk_tiles=chunk)


def run_fb(eps):
    return tile_mod.trace_tile_fb(tsvo, o * (1 + eps), d, corners,
                                  k_max=k_max, chunk_tiles=chunk,
                                  fb_tiles=fb_tiles, fb_k=fb_k)


for name, fn in (("trace_tile", run_trace), ("trace_tile_fb", run_fb)):
    t0 = time.time()
    r = fn(0.0)
    un = int(jnp.sum(r[1]))
    hits = int(jnp.sum(r[0].hit_leaf >= 0))
    print(f"{name}: warmup {time.time()-t0:.1f}s unresolved={un} hits={hits}",
          flush=True)
    t0 = time.time()
    for i in range(iters):
        fence(fn(i * 1e-7))
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:8.1f} ms/frame  {n/dt/1e6:6.1f} Mrays/s",
          flush=True)
