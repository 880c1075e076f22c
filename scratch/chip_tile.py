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
tpx = int(sys.argv[1]) if len(sys.argv) > 1 else 16
k_max = int(sys.argv[2]) if len(sys.argv) > 2 else 48
ct = int(sys.argv[3]) if len(sys.argv) > 3 else 256
o, d, corners, grid = tile.tile_rays(cam, np, tile_px=tpx)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)

def run():
    r, un = tile.trace_tile(ts, o, d, corners, k_max=k_max, chunk_tiles=ct)
    return float(jnp.sum(r.hit_t) + jnp.sum(r.hit_leaf) + jnp.sum(un))

t0 = time.time(); run(); print(f"warmup(compile+run): {time.time()-t0:.1f}s")
t0 = time.time(); reps = 5
for _ in range(reps): run()
dt = (time.time()-t0)/reps
print(f"tile={tpx} K={k_max} chunk={ct}: {dt*1e3:.1f} ms/frame fwd "
      f"({1.048576/dt:.1f} Mrays/s)")
r, un = tile.trace_tile(ts, o, d, corners, k_max=k_max, chunk_tiles=ct)
print("unresolved:", int(jnp.sum(un)), " hits:", int(jnp.sum(r.hit_leaf >= 0)))
