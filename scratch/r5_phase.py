"""r5: where does the 1024^2 depth-10 forward frame actually go?

Decomposes candidates / walk / fallback / shading at the bench config and
probes the phase-1 selection alternatives (full value-packed sort vs
lax.top_k) at the exact shapes phase 1 sorts.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
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
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
albedo = jnp.asarray(svo.leaf_albedo)
normal = jnp.asarray(svo.leaf_normal)
density = jnp.asarray(svo.leaf_density)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
iters = 6
o_vars = [jnp.asarray(np.asarray(o) * (1.0 + 1e-7 * i))
          for i in range(iters + 1)]
c_vars = [jnp.asarray(np.asarray(corners) * (1.0 + 1e-7 * i))
          for i in range(iters + 1)]
apex = o[0, 0]
n = 1024 * 1024


def timeit(name, fn, vars_):
    for _ in range(6):          # deep warm (fresh-compile execution tax)
        float(fn(vars_[-1]))
    t0 = time.time()
    for i in range(iters):      # pipelined: issue all, fence at each float
        fn(vars_[i])
    # fence: one more dependent fetch
    float(fn(vars_[0]))
    dt = (time.time() - t0) / (iters + 1)
    print(f"{name:44s} {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s eq",
          flush=True)
    return dt


@partial(jax.jit, static_argnames=("k_max", "chunk"))
def cands_only(corners_, apex_, k_max, chunk):
    caps = tile_mod._default_caps(tsvo.top_depth, k_max)
    T = corners_.shape[0]
    g = T // chunk
    out = jax.lax.map(
        lambda c: tile_mod._candidates(jnp.asarray(tsvo.pyr),
                                       jnp.asarray(tsvo.cellmap), c, apex_,
                                       tsvo.top_depth, caps, k_max),
        corners_.reshape(g, chunk, 4, 3))
    return sum(jnp.sum(x) for x in (out[1], out[3]))


def walk_only(ov):
    r, un = tile_mod.trace_tile(tsvo, ov, d, corners, k_max=96,
                                chunk_tiles=256)
    return jnp.sum(r.hit_t) + jnp.sum(un)


def full_fb(ov):
    r, un = tile_mod.trace_tile_fb(tsvo, ov, d, corners, k_max=96,
                                   chunk_tiles=256, fb_tiles=96, fb_k=256)
    return jnp.sum(r.hit_t) + jnp.sum(un)


def fwd(ov):
    img, residual = diff.render_diff_tile(albedo, normal, density, tsvo,
                                          ov, d, corners, light,
                                          k_max=96, fb_tiles=96)
    return jnp.sum(img) + residual


def fwdbwd(ov):
    target_t = jnp.zeros((n, 3), jnp.float32)
    (loss, residual), grads = diff.loss_and_grads_tile(
        albedo, normal, density, tsvo, ov, d, corners, light, target_t,
        k_max=96, fb_tiles=96)
    gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
    return loss + gsum + residual


# session warm on a small program
small = diff.render_diff(albedo, normal, density, svo.device().masks,
                         jnp.asarray(svo.child_base), jnp.asarray(svo.leaf_base),
                         o.reshape(-1, 3)[:4096], d.reshape(-1, 3)[:4096],
                         10, light)
float(jnp.sum(small))
print("# session warm done", flush=True)

t_c = timeit("phase1 candidates only (k=96)", lambda c: cands_only(c, apex, 96, 256), c_vars)
t_w = timeit("trace_tile (cands + walk)", walk_only, o_vars)
t_f = timeit("trace_tile_fb (+re-walk)", full_fb, o_vars)
t_fw = timeit("render_diff_tile fwd (+shade)", fwd, o_vars)
t_fb = timeit("loss_and_grads_tile fwd+bwd", fwdbwd, o_vars)
print(f"# walk alone ~{(t_w-t_c)*1e3:.1f} ms, fb ~{(t_f-t_w)*1e3:.1f} ms, "
      f"shade ~{(t_fw-t_f)*1e3:.1f} ms, bwd ~{(t_fb-t_fw)*1e3:.1f} ms",
      flush=True)

# ---- phase-1 selection alternatives at the exact sorted shapes ----
# default caps at k=96, top_depth 7: levels sort (256, c_prev*8) per chunk
caps = tile_mod._default_caps(tsvo.top_depth, 96)
print(f"# caps: {caps}", flush=True)
rng = np.random.default_rng(0)


@partial(jax.jit, static_argnames=("mode", "k"))
def sel(vals, mode, k):
    if mode == "sort":
        return jnp.sum(jnp.sort(vals, axis=1)[:, :k])
    if mode == "topk":
        nv, _ = jax.lax.top_k(-vals, k)
        return jnp.sum(-nv)
    if mode == "sortfull":
        return jnp.sum(jnp.sort(vals, axis=1))


for (T, W, k) in ((4096, 480, 96), (4096, 320, 60), (4096, 216, 40),
                  (4096, 144, 27)):
    vals = jnp.asarray(rng.integers(0, 2**30, (T, W)).astype(np.int32))
    vv = [vals + i for i in range(iters + 1)]
    for mode in ("sort", "topk"):
        for _ in range(6):
            float(sel(vv[-1], mode, k))
        t0 = time.time()
        for i in range(iters):
            sel(vv[i], mode, k)
        float(sel(vv[0], mode, k))
        dt = (time.time() - t0) / (iters + 1)
        print(f"sel {mode:5s} ({T},{W})->k={k}: {dt*1e3:7.2f} ms", flush=True)
