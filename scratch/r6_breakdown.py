"""r6: device-op breakdown of the CURRENT bench-config fwd and fwd+bwd
frames (k=96, fbt=96, fb2=16) — picks this session's optimization targets."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu import diff
from raytracingtest_tpu.utils.profiling import device_op_breakdown

print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
albedo = jnp.asarray(svo.leaf_albedo)
normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
target_t = jnp.zeros((1024 * 1024, 3), jnp.float32)


def fwd():
    img, residual = diff.render_diff_tile(
        albedo, normal, density, tsvo, o, d, corners, light,
        k_max=96, fb_tiles=96, fb2_tiles=16)
    return float(jnp.sum(img) + residual)


def fwdbwd():
    (loss, residual), grads = diff.loss_and_grads_tile(
        albedo, normal, density, tsvo, o, d, corners, light, target_t,
        k_max=96, fb_tiles=96, fb2_tiles=16)
    gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
    return float(loss + gsum + residual)


for name, fn in (("fwd", fwd), ("fwdbwd", fwdbwd)):
    for _ in range(3):
        fn()
    rows = device_op_breakdown(fn, logdir=f"/tmp/rtt_trace_{name}", calls=3,
                               top=40)
    tot = sum(ms for _, ms, _ in rows)
    print(f"==== {name}: device total {tot/3:.1f} ms/call ====", flush=True)
    for op, ms, cnt in rows[:40]:
        print(f"  {ms/3:8.2f} ms  x{cnt//3:<5d} {op[:110]}")
