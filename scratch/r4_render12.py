"""Depth-12 2048^2 tile render with a depth-scaled fallback budget."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
print(jax.devices(), file=sys.stderr)
host = _ckpt.load_svo("/tmp/bench_svo_terrain_d12.npz")
print(f"# loaded d12: {host.n_nodes} nodes {host.n_leaves} leaves",
      file=sys.stderr)
tsvo = tile_mod.make_tile_svo(host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=2048, height=2048)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
for fbt, fbk in ((1024, 192), (512, 256)):
    for i in range(4):
        r, un = tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                       k_max=96, chunk_tiles=256,
                                       fb_tiles=fbt, fb_k=fbk)
    nh = int(jnp.sum(r.hit_leaf >= 0)); nu = int(jnp.sum(un))
    t0 = time.time()
    outs = [tile_mod.trace_tile_fb(tsvo, o * (1 + 1e-7 * i), d, corners,
                                   k_max=96, chunk_tiles=256, fb_tiles=fbt,
                                   fb_k=fbk) for i in range(4)]
    acc = sum(float(jnp.sum(rr.hit_t) + jnp.sum(uu)) for rr, uu in outs)
    dt = (time.time() - t0) / 4
    print(f"d12 2048^2 fbt={fbt} fbk={fbk}: {dt*1e3:.1f} ms "
          f"({2048*2048/dt/1e6:.1f} Mrays/s) hits={nh} residual={nu}",
          flush=True)
