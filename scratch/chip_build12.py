"""Depth-12 device build demo (BASELINE config 5 scale), feeding split_svo.

The full-size terrain/sphere at depth 12 produces ~70-200M-candidate
frontiers whose phase-C programs the remote compiler cannot finish in
reasonable time (>1h observed); a smaller-shell scene exercises the same
12-level code path (4096^3 effective grid) with tractable shapes.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import numpy as np
from raytracingtest_tpu.scenes import Scene
from raytracingtest_tpu.ops.octree_device import build_svo_device

print("# devices:", jax.devices(), file=sys.stderr)


def _small_sphere(x, y, z, xp):
    r = xp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return r - 0.08


scene = Scene("sphere_r008", _small_sphere, 1.0)
t0 = time.time()
svo = build_svo_device(scene, 12, verbose=True)
t_first = time.time() - t0
print(f"d12: first build {t_first:.1f}s nodes={svo.n_nodes} "
      f"leaves={svo.n_leaves} level_start={svo.level_start}", flush=True)
t0 = time.time()
svo = build_svo_device(scene, 12)
print(f"d12: steady build {time.time()-t0:.1f}s", flush=True)

# feed split_svo (the level-sharded deep-tree path, BASELINE config 5)
from raytracingtest_tpu.parallel.level_sharded import split_svo
host = jax.tree_util.tree_map(np.asarray, svo)
t0 = time.time()
ls = split_svo(host, split_level=2, n_devices=8)
print(f"split_svo(d12, level 2, 8 devices): {time.time()-t0:.1f}s, "
      f"arena nodes/device={ls.arena_masks.shape[1]}", flush=True)
