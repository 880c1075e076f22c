import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
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
target = jnp.zeros((o.shape[0]*o.shape[1], 3), jnp.float32)

def t(name, f, reps=5):
    f()
    t0 = time.time()
    for _ in range(reps): f()
    print(f"{name:12s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

t("fwd", lambda: float(jnp.sum(diff.render_diff_tile(
    albedo, normal, density, ts, o, d, corners, light, k_max=96)[0])))
def fb():
    loss, grads = diff.loss_and_grads_tile(albedo, normal, density, ts, o,
                                           d, corners, light, target,
                                           k_max=96)
    return float(loss + sum(jnp.sum(jnp.abs(g))
                            for g in jax.tree_util.tree_leaves(grads)))
t("fwd+bwd", fb)
