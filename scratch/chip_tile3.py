import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from functools import partial
import raytracingtest_tpu as rt
from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops import tile
from raytracingtest_tpu.ops.camera import Camera

print("# devices:", jax.devices(), file=sys.stderr)
svo_host = ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
ts = tile.make_tile_svo(svo_host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
tpx = int(sys.argv[1]) if len(sys.argv) > 1 else 16
o, d, corners, grid = tile.tile_rays(cam, np, tile_px=tpx)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
pyr, cellmap = jnp.asarray(ts.pyr), jnp.asarray(ts.cellmap)
apex = o[0, 0]
k_max = 48
caps = tile._default_caps(ts.top_depth, k_max)
T = o.shape[0]

# candidates for the whole frame in one jit (chunked map like production)
@jax.jit
def cand_all():
    g = T // 256
    return jax.lax.map(lambda c: tile._candidates(
        pyr, cellmap, c, apex, ts.top_depth, caps, k_max),
        corners.reshape(g, 256, 4, 3))

def fence(x):
    return float(sum(jnp.sum(jnp.asarray(v).astype(jnp.float32))
                     for v in jax.tree_util.tree_leaves(x)))

r = cand_all(); fence(r)
t0 = time.time()
for _ in range(4): fence(cand_all())
print(f"candidates(all): {(time.time()-t0)/4*1e3:.1f} ms")
codes = np.asarray(r[0])  # (g, 256, K)
valid = (codes >= 0).sum(axis=-1)
print("candidates/tile: mean", valid.mean(), "p50", np.percentile(valid, 50),
      "p90", np.percentile(valid, 90), "p99", np.percentile(valid, 99),
      "max", valid.max())
