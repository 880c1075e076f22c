"""r5: final bench-config sweep (k_max x fb budgets, fwd and fwd+bwd)
with residual-0 enforcement — picks the shipped bench defaults."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu import diff
print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); dj = jnp.asarray(d); cj = jnp.asarray(corners)
albedo = jnp.asarray(svo.leaf_albedo); normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
target_t = jnp.zeros((1024 * 1024, 3), jnp.float32)
iters = 6; n = 1024 * 1024
o_vars = [jnp.asarray(np.asarray(o) * (1 + 1e-7 * i)) for i in range(iters + 1)]


def timeit(name, fn):
    for _ in range(6):
        float(fn(o_vars[-1]))
    t0 = time.time()
    for i in range(iters):
        fn(o_vars[i])
    float(fn(o_vars[0]))
    dt = (time.time() - t0) / (iters + 1)
    print(f"{name:46s} {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s", flush=True)
    return dt


for k, fbt, fb2 in ((96, 96, 16), (64, 96, 16), (64, 128, 16),
                    (48, 128, 32), (96, 64, 16)):
    def fwd(ov, k=k, fbt=fbt, fb2=fb2):
        img, residual = diff.render_diff_tile(
            albedo, normal, density, tsvo, ov, dj, cj, light,
            k_max=k, fb_tiles=fbt, fb2_tiles=fb2)
        return jnp.sum(img) + residual
    timeit(f"fwd k={k} fbt={fbt} fb2={fb2}", fwd)
    img, res = diff.render_diff_tile(albedo, normal, density, tsvo, o, dj,
                                     cj, light, k_max=k, fb_tiles=fbt,
                                     fb2_tiles=fb2)
    print(f"   residual={int(res)}", flush=True)

for k, fbt, fb2 in ((96, 96, 16), (64, 128, 16)):
    def fb(ov, k=k, fbt=fbt, fb2=fb2):
        (loss, residual), grads = diff.loss_and_grads_tile(
            albedo, normal, density, tsvo, ov, dj, cj, light, target_t,
            k_max=k, fb_tiles=fbt, fb2_tiles=fb2)
        gsum = sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum + residual
    timeit(f"fwdbwd k={k} fbt={fbt} fb2={fb2}", fb)
