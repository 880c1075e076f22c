"""On-chip shootout: Pallas kernel vs brick XLA path vs plain XLA path.

Usage: python scratch/chip_pallas.py [depth] [res]
Prints per-path steady-state ms and rays/s, and asserts hit equality.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
res = int(sys.argv[2]) if len(sys.argv) > 2 else 512

print(f"# devices: {jax.devices()}", file=sys.stderr)

from raytracingtest_tpu import build_svo, get_scene
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import brick as brick_mod
from raytracingtest_tpu.ops import traverse, traverse_pallas
from raytracingtest_tpu.ops.camera import Camera
import os

scene = os.environ.get("SCENE", "terrain")
cache = f"/tmp/bench_svo_{scene}_d{depth}.npz"
if os.path.exists(cache):
    svo_host = _ckpt.load_svo(cache)
else:
    svo_host = build_svo(get_scene(scene), depth).svo
    _ckpt.save_svo(svo_host, cache)
svo = svo_host.device()
bsvo = brick_mod.make_brick_svo(svo_host).device()
print(f"# nodes={svo.n_nodes} leaves={svo.n_leaves} "
      f"top={bsvo.n_top} bricks={bsvo.n_bricks}", file=sys.stderr)

cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=res, height=res)
o, d = cam.rays(np)
o = jnp.asarray(o)
d = jnp.asarray(d)
n = o.shape[0]


def _fence(r):
    # host transfer of a value depending on every output — block_until_ready
    # is NOT a reliable fence on the experimental axon backend
    leaves = jax.tree_util.tree_leaves(r)
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))


def timeit(name, fn, iters=6):
    try:
        t0 = time.time()
        r0 = fn()
        _fence(r0)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            r = fn()
            _fence(r)
        dt = (time.time() - t0) / iters
        print(f"{name:16s} compile={compile_s:6.1f}s  steady={dt*1e3:8.2f} ms"
              f"  {n/dt/1e6:10.1f} Mray/s", flush=True)
        return r
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


r_brick = timeit("brick", lambda: brick_mod._trace_brick_jax(
    bsvo.top_masks, bsvo.top_child, bsvo.top_parent, bsvo.bricks,
    o, d, depth, bsvo.top_depth))
r_pallas = timeit("pallas", lambda: traverse_pallas._trace_pallas(
    svo.masks, svo.child_base, svo.leaf_base, o, d, depth))
if os.environ.get("RUN_PLAIN", "1") == "1":
    r_plain = timeit("xla-plain", lambda: traverse._trace_jax(
        svo.masks, svo.child_base, svo.leaf_base, svo.parent_ptr, o, d, depth))
else:
    r_plain = None

if os.environ.get("RUN_BWD", "1") == "1":
    from raytracingtest_tpu import diff
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    target = jnp.zeros((n, 3), jnp.float32)

    def run_bwd_brick():
        loss, grads = diff.loss_and_grads_brick(
            albedo, normal, density, bsvo.top_masks, bsvo.top_child,
            bsvo.top_parent, bsvo.bricks, o, d, depth, bsvo.top_depth,
            light, target)
        return loss

    def run_bwd_pallas():
        loss, grads = diff.loss_and_grads_pallas(
            albedo, normal, density, svo.masks, svo.child_base,
            svo.leaf_base, o, d, depth, light, target)
        return loss

    timeit("brick fwd+bwd", run_bwd_brick)
    timeit("pallas fwd+bwd", run_bwd_pallas)

for name, r in (("pallas", r_pallas), ("xla-plain", r_plain)):
    if r is None or r_brick is None:
        continue
    a = np.asarray(r_brick.hit_leaf)
    b = np.asarray(r.hit_leaf)
    eq = (a == b).mean()
    teq = np.allclose(np.asarray(r_brick.hit_t)[a >= 0],
                      np.asarray(r.hit_t)[a >= 0], rtol=0, atol=0)
    print(f"# {name} vs brick: hit_leaf match {eq*100:.3f}%  t bit-equal={teq}")
