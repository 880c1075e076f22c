import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
import raytracingtest_tpu as rt
from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops import tile
from raytracingtest_tpu import diff
from raytracingtest_tpu.ops.camera import Camera

print("# devices:", jax.devices(), file=sys.stderr)
svo_host = ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
ts = tile.make_tile_svo(svo_host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, grid = tile.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
albedo = jnp.asarray(svo_host.leaf_albedo)
normal = jnp.asarray(svo_host.leaf_normal)
density = jnp.asarray(svo_host.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)

def t(name, f, reps=4):
    r = f()
    t0 = time.time()
    for _ in range(reps): f()
    print(f"{name:40s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return r

K = 96
fat = (1, 8, 16, 32, 64, 96, 128)
for caps, label in [(None, "default caps"), (fat, "fat caps")]:
    r, un = tile.trace_tile(ts, o, d, corners, k_max=K, caps=caps)
    print(f"{label}: unresolved={int(jnp.sum(un))}")
    t(f"trace_tile K={K} {label}",
      lambda c=caps: float(jnp.sum(tile.trace_tile(ts, o, d, corners, k_max=K, caps=c)[0].hit_t)))
t(f"trace_tile_fb K={K}",
  lambda: float(jnp.sum(tile.trace_tile_fb(ts, o, d, corners, k_max=K)[0].hit_t)))
t("render_diff_tile K=96",
  lambda: float(jnp.sum(diff.render_diff_tile(albedo, normal, density, ts, o, d, corners, light, k_max=K)[0])))
