"""r5: warm-rebuild story for the depth-12 device build (VERDICT r04 item
8) + the depth-12 2048^2 residual kill via fb2 (item 4).

Build #1 pays one-time remote compiles (cold); build #2 runs the cached
program set — the steady-state rebuild number a production world-editing
loop would see."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu import get_scene
from raytracingtest_tpu.ops.octree_device import build_svo_device_split
print(jax.devices(), file=sys.stderr)

t0 = time.time()
svo = build_svo_device_split(get_scene("terrain"), 12, split_level=2)
jax.block_until_ready(svo.masks)
cold = time.time() - t0
print(f"depth-12 cold build (incl one-time compiles): {cold:.0f}s  "
      f"{svo.n_nodes} nodes {svo.n_leaves} leaves", flush=True)

t0 = time.time()
svo2 = build_svo_device_split(get_scene("terrain"), 12, split_level=2)
jax.block_until_ready(svo2.masks)
warm = time.time() - t0
print(f"depth-12 WARM rebuild: {warm:.0f}s  {svo2.n_nodes} nodes "
      f"{svo2.n_leaves} leaves", flush=True)
assert svo2.n_nodes == svo.n_nodes and svo2.n_leaves == svo.n_leaves

from raytracingtest_tpu.io import checkpoint as _ckpt
host = jax.tree_util.tree_map(np.asarray, svo)
_ckpt.save_svo(host, "/tmp/bench_svo_terrain_d12.npz")
print("saved /tmp/bench_svo_terrain_d12.npz", flush=True)

# ---- depth-12 2048^2 render: residual -> ~0 via the sub-tile re-walk ----
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
tsvo = tile_mod.make_tile_svo(host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=2048, height=2048)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
n = 2048 * 2048
for fbt, fbk, fb2t, s in ((96, 256, 0, 2), (96, 256, 64, 2),
                          (96, 256, 128, 2), (128, 256, 192, 2)):
    for i in range(3):
        r, un = tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                       k_max=96, chunk_tiles=256,
                                       fb_tiles=fbt, fb_k=fbk,
                                       fb2_tiles=fb2t, fb2_split=s)
    nh = int(jnp.sum(r.hit_leaf >= 0)); nu = int(jnp.sum(un))
    t0 = time.time()
    outs = [tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                   k_max=96, chunk_tiles=256, fb_tiles=fbt,
                                   fb_k=fbk, fb2_tiles=fb2t, fb2_split=s)
            for i in range(4)]
    acc = sum(float(jnp.sum(rr.hit_t) + jnp.sum(uu)) for rr, uu in outs)
    dt = (time.time() - t0) / 4
    print(f"d12 2048^2 fbt={fbt} fbk={fbk} fb2={fb2t}x{s}: "
          f"{dt*1e3:.0f} ms/frame ({n/dt/1e6:.1f} Mrays/s) hits={nh} "
          f"residual={nu} ({nu/n*100:.3f}%)", flush=True)
