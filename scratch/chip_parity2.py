import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops import tile, traverse, brick
from raytracingtest_tpu.ops.camera import Camera

print(jax.devices(), file=sys.stderr)
svo_host = ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
svo = svo_host.device()
ts = tile.make_tile_svo(svo_host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=128, height=128)
o, d, corners, grid = tile.tile_rays(cam, np)
r1, un = tile.trace_tile(ts, o, d, corners)
r0 = traverse.trace_jax(svo, jnp.asarray(o.reshape(-1, 3)),
                        jnp.asarray(d.reshape(-1, 3)))
rb = brick.trace_brick_jax(ts.bsvo, jnp.asarray(o.reshape(-1, 3)),
                           jnp.asarray(d.reshape(-1, 3)))
hl0, hl1, hlb = (np.asarray(r0.hit_leaf), np.asarray(r1.hit_leaf),
                 np.asarray(rb.hit_leaf))
un = np.asarray(un)
mism = (hl0 != hl1) & ~un
print("tile mism:", mism.sum(), "brick-vs-plain mism:", (hl0 != hlb).sum())
i = np.flatnonzero(mism)[:8]
print("idx", i)
print("plain leaf", hl0[i])
print("tile  leaf", hl1[i])
print("brick leaf", hlb[i])
print("delta", hl1[i] - hl0[i])
