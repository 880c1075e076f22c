"""Overlapped gradient all-reduce evidence (VERDICT r03 item 5 / config 5).

Captures a jax.profiler trace of the tile train step with overlap_groups=4
on the 8-device CPU mesh: each tile group's gradient psum is emitted as soon
as that group's backward finishes, with no data dependency on later groups'
compute — the scheduler is free to run the collective under the remaining
backward. Inspect the trace (xplane) for all-reduce ops interleaved between
backward fusions rather than bunched at the step tail.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scratch/r4_overlap.py
"""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

import raytracingtest_tpu as rt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.parallel.mesh import make_mesh
from raytracingtest_tpu.parallel.render_sharded import make_train_step_tile

res = rt.build_svo(rt.get_scene("terrain"), 7)
tsvo = tile_mod.make_tile_svo(res.svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=256, height=256)
o, d, corners, _ = tile_mod.tile_rays(cam, np)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
n = o.shape[0] * o.shape[1]
target = jnp.zeros((n, 3), jnp.float32)
params = {"albedo": jnp.asarray(res.svo.leaf_albedo),
          "normal": jnp.asarray(res.svo.leaf_normal),
          "density": jnp.asarray(res.svo.leaf_density)}
mesh = make_mesh()
opt = optax.adam(1e-2)
st = opt.init(params)
step = make_train_step_tile(mesh, opt, chunk_tiles=32, fb_tiles=32,
                            fb_k=256, overlap_groups=4)
args = (params, st, tsvo, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(corners), light, target)
step(*args)  # compile outside the trace

# count the all-reduces in the compiled HLO: one per group per param tensor
lowered = jax.jit(lambda *a: step(*a)).lower(*args)
hlo = lowered.compile().as_text()
n_ar = hlo.count("all-reduce")
print(f"all-reduce ops in compiled HLO: {n_ar} (4 groups x params + loss)")

with jax.profiler.trace("/tmp/rtt_overlap_trace"):
    out = step(*args)
    jax.block_until_ready(out[0])
print("trace written to /tmp/rtt_overlap_trace; loss", float(out[2]))
