import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
import raytracingtest_tpu as rt
from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops import tile
from raytracingtest_tpu.ops.camera import Camera

print("# devices:", jax.devices(), file=sys.stderr)
svo_host = ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
ts = tile.make_tile_svo(svo_host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, grid = tile.tile_rays(cam, np, tile_px=16)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)

def run(K, ct, du, reps=5):
    def f():
        r, un = tile.trace_tile(ts, o, d, corners, k_max=K, chunk_tiles=ct,
                                dda_unroll=du)
        return float(jnp.sum(r.hit_t) + jnp.sum(un))
    f()
    t0 = time.time()
    for _ in range(reps): f()
    dt = (time.time()-t0)/reps
    print(f"K={K} chunk={ct} unroll={du}: {dt*1e3:7.1f} ms", flush=True)

run(96, 256, 6)   # current default reference point (same session!)
run(96, 512, 6)
run(96, 1024, 6)
run(96, 512, 4)
run(96, 512, 8)
run(64, 512, 6)
