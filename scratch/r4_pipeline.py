"""Dispatch pipelining probe: is the ~25 ms dispatch+fence round trip
hidden when several frames are issued before fencing? Measures sync-per-
frame vs issue-all-then-fence for the full forward (trace_tile_fb) and the
fwd+bwd step."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu import diff
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
albedo = jnp.asarray(svo.leaf_albedo)
normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
target = jnp.zeros((n, 3), jnp.float32)


def fwd(ov):
    img, resid = diff.render_diff_tile(albedo, normal, density, tsvo, ov, d,
                                       corners, light, k_max=96)
    return jnp.sum(img) + resid


def fwdbwd(ov):
    (loss, resid), grads = diff.loss_and_grads_tile(
        albedo, normal, density, tsvo, ov, d, corners, light, target,
        k_max=96)
    return (loss + resid
            + sum(jnp.sum(jnp.abs(g))
                  for g in jax.tree_util.tree_leaves(grads)))


for name, fn in (("fwd", fwd), ("fwdbwd", fwdbwd)):
    for i in range(6):                      # deep warmup (fresh-compile tax)
        float(fn(o_vars[i % 3]))
    t0 = time.time()
    for i in range(iters):
        float(fn(o_vars[i]))                # sync per frame
    dt_sync = (time.time() - t0) / iters
    t0 = time.time()
    outs = [fn(o_vars[i]) for i in range(iters)]   # issue all
    acc = sum(float(x) for x in outs)              # fence once
    dt_pipe = (time.time() - t0) / iters
    print(f"{name:7s} sync/frame {dt_sync*1e3:7.1f} ms "
          f"({n/dt_sync/1e6:5.1f} Mrays/s)   pipelined {dt_pipe*1e3:7.1f} ms "
          f"({n/dt_pipe/1e6:5.1f} Mrays/s)", flush=True)
