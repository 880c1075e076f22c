"""Trip-count diagnosis: per-chunk while-loop trips of the window walker."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RTT_TILE_DEBUG_TRIPS"] = "1"
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
chunk = int(os.environ.get("R4_CHUNK", "256"))
res, un = tile_mod.trace_tile(tsvo, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(corners), k_max=96,
                              chunk_tiles=chunk)
trips = np.asarray(res.iters).reshape(-1, chunk * 256)[:, 0]
print("per-chunk trips:", trips.tolist())
print("total trips:", int(trips.sum()))
# candidate stats
codes, ids_, t_codes, drop_t = tile_mod._candidates(
    jnp.asarray(tsvo.pyr), jnp.asarray(tsvo.cellmap),
    jnp.asarray(corners[:256], jnp.float32), jnp.asarray(o[0,0]),
    tsvo.top_depth, tile_mod._default_caps(tsvo.top_depth, 96), 96)
cnt = np.asarray((ids_ >= 0).sum(axis=1))
print("first-256-tile candidate counts: mean", cnt.mean(), "max", cnt.max())
