"""In-session sweep of traversal tuning knobs (chunk width, unroll factors).

Mutates the module-level knobs and re-jits the underlying functions so one
TPU session (one handshake) measures every config. Host-transfer fenced.
"""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

print(f"# devices: {jax.devices()}", file=sys.stderr)

import raytracingtest_tpu.ops.traverse as T
import raytracingtest_tpu.ops.brick as B
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops.camera import Camera

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
cache = f"/tmp/bench_svo_terrain_d{depth}.npz"
svo_host = _ckpt.load_svo(cache)
svo = svo_host.device()
bsvo = B.make_brick_svo(svo_host).device()

cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=res, height=res)
o, d = cam.rays(np)
o = jnp.asarray(o)
d = jnp.asarray(d)
n = o.shape[0]


def fence(r):
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                     for l in jax.tree_util.tree_leaves(r)))


def timeit(name, fn, iters=5):
    try:
        t0 = time.time()
        fence(fn())
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            r = fn()
            fence(r)
        dt = (time.time() - t0) / iters
        print(f"{name:34s} compile={comp:6.1f}s steady={dt*1e3:8.2f} ms "
              f"{n/dt/1e6:8.1f} Mray/s", flush=True)
        return dt
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


results = {}

plain_raw = T._trace_jax.__wrapped__
for chunk, unroll in [(65536, 1), (65536, 2), (65536, 4), (32768, 4),
                      (131072, 2)]:
    T.TRACE_CHUNK = chunk
    T.STEP_UNROLL = unroll
    f = partial(jax.jit, static_argnames=("depth", "root"))(plain_raw)
    dt = timeit(f"plain fwd c={chunk//1024}K u={unroll}",
                lambda: f(svo.masks, svo.child_base, svo.leaf_base,
                          svo.parent_ptr, o, d, depth))
    results[("plain", chunk, unroll)] = dt

brick_raw = B._trace_brick_jax.__wrapped__
for chunk, tu, du in [(65536, 1, 2), (65536, 2, 4), (65536, 4, 6),
                      (32768, 4, 6), (131072, 2, 4)]:
    B.TRACE_CHUNK = chunk
    B.TOP_UNROLL = tu
    B.DDA_UNROLL = du
    f = partial(jax.jit, static_argnames=("depth", "top_depth"))(brick_raw)
    dt = timeit(f"brick fwd c={chunk//1024}K tu={tu} du={du}",
                lambda: f(bsvo.top_masks, bsvo.top_child, bsvo.top_parent,
                          bsvo.bricks, o, d, depth, bsvo.top_depth))
    results[("brick", chunk, tu, du)] = dt

best = min((v, k) for k, v in results.items() if v is not None)
print(f"# best: {best[1]} at {best[0]*1e3:.2f} ms", flush=True)
