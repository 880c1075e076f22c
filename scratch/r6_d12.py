"""r6: depth-12 2048^2 residual kill — big fallback budgets on the cached
depth-12 terrain (VERDICT r04 item 4: residual < 0.1% of rays).
Usage: python scratch/r6_d12.py k fbt fbk fb2 split
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera

k, fbt, fbk, fb2, split = (int(a) for a in sys.argv[1:6])
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d12.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=2048, height=2048)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
n = 2048 * 2048
for i in range(3):
    r, un = tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                   k_max=k, chunk_tiles=256, fb_tiles=fbt,
                                   fb_k=fbk, fb2_tiles=fb2, fb2_split=split)
nh = int(jnp.sum(r.hit_leaf >= 0)); nu = int(jnp.sum(un))
t0 = time.time()
outs = [tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                               k_max=k, chunk_tiles=256, fb_tiles=fbt,
                               fb_k=fbk, fb2_tiles=fb2, fb2_split=split)
        for i in range(4)]
acc = sum(float(jnp.sum(rr.hit_t) + jnp.sum(uu)) for rr, uu in outs)
dt = (time.time() - t0) / 4
print(f"d12 2048^2 k={k} fbt={fbt} fbk={fbk} fb2={fb2}x{split}: "
      f"{dt*1e3:.0f} ms/frame ({n/dt/1e6:.1f} Mrays/s) hits={nh} "
      f"residual={nu} ({100.0*nu/n:.3f}%)", flush=True)
