"""Final forward tuning sweep: (fb_tiles, fb_k) x dda_unroll, pipelined
timing with deep warmup."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
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
d = jnp.asarray(d); corners = jnp.asarray(corners)
n = 1024 * 1024
iters = 8
o_vars = [jnp.asarray(np.asarray(o) * (1.0 + 1e-7 * i))
          for i in range(iters)]

configs = [
    (96, 256, 256), (96, 128, 256), (96, 128, 192), (96, 96, 256),
    (96, 64, 256),
]
for k, fbt, fbk in configs:
    def fn(ov):
        r, un = tile_mod.trace_tile_fb(tsvo, ov, d, corners, k_max=k,
                                       chunk_tiles=256, fb_tiles=fbt,
                                       fb_k=fbk)
        return jnp.sum(r.hit_t) + jnp.sum(un)
    for i in range(6):
        float(fn(o_vars[i % 3]))
    r, un = tile_mod.trace_tile_fb(tsvo, o_vars[0], d, corners, k_max=k,
                                   chunk_tiles=256, fb_tiles=fbt, fb_k=fbk)
    nun = int(jnp.sum(un))
    t0 = time.time()
    outs = [fn(o_vars[i]) for i in range(iters)]
    sum(float(v) for v in outs)
    dt = (time.time() - t0) / iters
    print(f"k={k} fbt={fbt:3d} fbk={fbk}: {dt*1e3:7.1f} ms "
          f"{n/dt/1e6:5.1f} Mrays/s residual={nun}", flush=True)
