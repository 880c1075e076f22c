"""r6: tile size A/B. A 16x16 tile's frustum at the horizon is wide, so its
candidate list is long and every ray pays skip-scan trips for bricks on
other rays' paths. 8x8 tiles quadruple tile count but shrink lists.
Usage: python scratch/r6_tpx.py <tile_px> <k_max> <chunk_tiles> <fbt> [fb2]"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu import diff

tpx = int(sys.argv[1]); k = int(sys.argv[2]); ct = int(sys.argv[3])
fbt = int(sys.argv[4]); fb2 = int(sys.argv[5]) if len(sys.argv) > 5 else 16
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np, tile_px=tpx)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
albedo = jnp.asarray(svo.leaf_albedo); normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
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
    print(f"{name:52s} {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s", flush=True)
    return dt


def tr(ov):
    res, un = tile_mod.trace_tile(tsvo, ov, d, corners, k_max=k,
                                  chunk_tiles=ct)
    return jnp.sum(res.hit_t) + jnp.sum(un)


def fwd(ov):
    img, residual = diff.render_diff_tile(
        albedo, normal, density, tsvo, ov, d, corners, light,
        k_max=k, chunk_tiles=ct, fb_tiles=fbt, fb2_tiles=fb2)
    return jnp.sum(img) + residual


timeit(f"trace tpx={tpx} k={k} ct={ct}", tr)
res, un = tile_mod.trace_tile(tsvo, o, d, corners, k_max=k, chunk_tiles=ct)
unn = np.asarray(un).reshape(o.shape[0], o.shape[1])
print(f"   unresolved rays={unn.sum()} tiles={(unn.any(axis=1)).sum()}")
timeit(f"fwd tpx={tpx} k={k} ct={ct} fbt={fbt} fb2={fb2}", fwd)
img, resid = diff.render_diff_tile(albedo, normal, density, tsvo, o, d,
                                   corners, light, k_max=k, chunk_tiles=ct,
                                   fb_tiles=fbt, fb2_tiles=fb2)
print(f"   residual={int(resid)}", flush=True)
