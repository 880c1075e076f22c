import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import numpy as np
import raytracingtest_tpu as rt
from raytracingtest_tpu.ops.octree_device import build_svo_device

print("# devices:", jax.devices(), file=sys.stderr)
depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
scene = sys.argv[2] if len(sys.argv) > 2 else "terrain"

t0 = time.time()
svo = build_svo_device(rt.get_scene(scene), depth, verbose=True)
t_first = time.time() - t0
print(f"{scene} d{depth}: first build (incl compiles) {t_first:.1f}s "
      f"nodes={svo.n_nodes} leaves={svo.n_leaves}", flush=True)
t0 = time.time()
svo = build_svo_device(rt.get_scene(scene), depth, verbose=True)
print(f"{scene} d{depth}: steady build {time.time()-t0:.1f}s", flush=True)
