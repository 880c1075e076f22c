"""Config-5 scale on chip: depth-12 FULL TERRAIN via the split device build
(bounded per-octant programs; the monolithic phase-C compile wall is gone)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu import get_scene
from raytracingtest_tpu.ops.octree_device import build_svo_device_split
print(jax.devices(), file=sys.stderr)
t0 = time.time()
svo = build_svo_device_split(get_scene("terrain"), 12, split_level=2,
                             verbose=True)
jax.block_until_ready(svo.masks)
dt = time.time() - t0
print(f"depth-12 terrain split build: {svo.n_nodes} nodes "
      f"{svo.n_leaves} leaves in {dt:.1f}s", flush=True)
# spot-check: a central ray hits the surface
from raytracingtest_tpu.ops import traverse
o = jnp.asarray([[0.5, 0.95, 0.5]], jnp.float32)
d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
r = traverse._trace_jax(svo.masks, svo.child_base, svo.leaf_base,
                        svo.parent_ptr, o, d, 12)
print("central ray:", int(r.hit_leaf[0]), float(r.hit_t[0]), flush=True)

# persist for the render stage + host-side inspection
from raytracingtest_tpu.io import checkpoint as _ckpt
host = jax.tree_util.tree_map(np.asarray, svo)
_ckpt.save_svo(host, "/tmp/bench_svo_terrain_d12.npz")
print("saved /tmp/bench_svo_terrain_d12.npz", flush=True)

# 2048^2 tile-path render of the depth-12 world on the chip
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
import jax.numpy as jnp
tsvo = tile_mod.make_tile_svo(host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=2048, height=2048)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
for i in range(3):
    r, un = tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                   k_max=96, chunk_tiles=256)
    nh = int(jnp.sum(r.hit_leaf >= 0)); nu = int(jnp.sum(un))
t0 = time.time()
outs = [tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                               k_max=96, chunk_tiles=256)
        for i in range(4)]
acc = sum(float(jnp.sum(rr.hit_t) + jnp.sum(uu)) for rr, uu in outs)
dt = (time.time() - t0) / 4
print(f"depth-12 2048^2 tile render ON CHIP: {dt*1e3:.1f} ms/frame "
      f"({2048*2048/dt/1e6:.1f} Mrays/s), hits={nh}, residual={nu}",
      flush=True)
