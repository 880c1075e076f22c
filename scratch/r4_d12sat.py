"""Depth-12 candidate saturation: how large must K be for horizon tiles?"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
print(jax.devices(), file=sys.stderr)
host = _ckpt.load_svo("/tmp/bench_svo_terrain_d12.npz")
tsvo = tile_mod.make_tile_svo(host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=2048, height=2048)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
apex = jnp.asarray(o[0, 0])
for K in (96, 256, 512):
    caps = tuple(min(K, 8 ** l) for l in range(tsvo.top_depth + 1))
    T = corners.shape[0]
    g = T // 256
    sat = 0
    dropped = 0
    for c in range(g):
        cs = jnp.asarray(corners[c * 256:(c + 1) * 256], jnp.float32)
        codes, ids, tlb, drop_t = tile_mod._candidates(
            jnp.asarray(tsvo.pyr), jnp.asarray(tsvo.cellmap), cs, apex,
            tsvo.top_depth, caps, K)
        cnt = jnp.sum(ids >= 0, axis=1)
        sat += int(jnp.sum(cnt >= K))
        dropped += int(jnp.sum(jnp.isfinite(drop_t)))
    print(f"K={K}: {sat}/{T} tiles saturated, {dropped} tiles with drops",
          flush=True)
