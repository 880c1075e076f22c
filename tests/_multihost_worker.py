"""Worker for the 2-process multi-host integration test.

Each process: join jax.distributed over CPU, generate ONLY its pixel rows,
assemble global sharded ray arrays, run the sharded forward render, and
dump its local output rows for the parent test to compare against a
single-process reference render.

Usage: python _multihost_worker.py <coordinator> <nproc> <pid> <outdir>
"""

import os
import sys

coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                             sys.argv[4])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracingtest_tpu as rt  # noqa: E402
from raytracingtest_tpu.ops.camera import Camera  # noqa: E402
from raytracingtest_tpu.parallel import multihost  # noqa: E402
from raytracingtest_tpu.parallel.mesh import make_mesh  # noqa: E402
from raytracingtest_tpu.parallel.render_sharded import render_sharded  # noqa: E402

res = rt.build_svo(rt.get_scene("sphere"), 4)
svo = res.svo.device()
H = W = 32
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=W, height=H)
mesh = make_mesh()
pr = multihost.process_rows(H, W)
o_l, d_l = multihost.local_camera_rays(cam, pr)
o = multihost.global_ray_array(mesh, pr, o_l)
d = multihost.global_ray_array(mesh, pr, d_l)
light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)

img = render_sharded(mesh, jnp.asarray(svo.leaf_albedo),
                     jnp.asarray(svo.leaf_normal),
                     jnp.asarray(svo.leaf_density), svo.masks,
                     svo.child_base, svo.leaf_base, o, d, svo.depth, light)

# each process persists the rows it owns (addressable shards)
rows = {}
for s in img.addressable_shards:
    rows[s.index[0].start or 0] = np.asarray(s.data)
np.savez(os.path.join(outdir, f"out_p{pid}.npz"),
         **{str(k): v for k, v in rows.items()})
print(f"worker {pid} done", flush=True)
