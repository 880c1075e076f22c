"""Config-5 scale on chip: depth-12 FULL TERRAIN via the split device build
(bounded per-octant programs; the monolithic phase-C compile wall is gone)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu import get_scene
from raytracingtest_tpu.ops.octree_device import build_svo_device_split
print(jax.devices(), file=sys.stderr)
t0 = time.time()
svo = build_svo_device_split(get_scene("terrain"), 12, split_level=2,
                             verbose=True)
jax.block_until_ready(svo.masks)
dt = time.time() - t0
print(f"depth-12 terrain split build: {svo.n_nodes} nodes "
      f"{svo.n_leaves} leaves in {dt:.1f}s", flush=True)
# spot-check: a central ray hits the surface
from raytracingtest_tpu.ops import traverse
o = jnp.asarray([[0.5, 0.95, 0.5]], jnp.float32)
d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
r = traverse._trace_jax(svo.masks, svo.child_base, svo.leaf_base,
                        svo.parent_ptr, o, d, 12)
print("central ray:", int(r.hit_leaf[0]), float(r.hit_t[0]), flush=True)
