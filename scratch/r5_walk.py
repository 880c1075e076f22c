"""r5: walk-cost structure. The window walker's while_loop carry at
chunk_tiles=256 is ~8 MB (rwords (Tc,P,16) u32 alone is 4 MB); PROFILE r2
says oversized carries stream HBM every trip. Sweep chunk_tiles (carry
size) x dda_unroll, then loads/skips for the heavy chunks."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from raytracingtest_tpu.io import checkpoint as _ckpt
from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera

print(jax.devices(), file=sys.stderr)
svo = _ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
tsvo = tile_mod.make_tile_svo(svo).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
o, d, corners, _g = tile_mod.tile_rays(cam, np)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
iters = 6
o_vars = [jnp.asarray(np.asarray(o) * (1.0 + 1e-7 * i))
          for i in range(iters + 1)]
n = 1024 * 1024

# oracle hits for exactness check
r_ref, un_ref = tile_mod.trace_tile(tsvo, o, d, corners, k_max=96,
                                    chunk_tiles=256)
h_ref = np.asarray(r_ref.hit_leaf)


def timeit(name, fn):
    for _ in range(6):
        float(fn(o_vars[-1]))
    t0 = time.time()
    for i in range(iters):
        fn(o_vars[i])
    float(fn(o_vars[0]))
    dt = (time.time() - t0) / (iters + 1)
    print(f"{name:44s} {dt*1e3:8.1f} ms  {n/dt/1e6:6.1f} Mrays/s eq",
          flush=True)
    return dt


def walk(ct, du, k=96):
    def f(ov):
        r, un = tile_mod.trace_tile(tsvo, ov, d, corners, k_max=k,
                                    chunk_tiles=ct, dda_unroll=du)
        return jnp.sum(r.hit_t) + jnp.sum(un)
    return f


for ct in (256, 128, 64, 32):
    timeit(f"walk ct={ct} du=6", walk(ct, 6))

# exactness spot-check at the sweep's smallest chunk
r_c, _ = tile_mod.trace_tile(tsvo, o, d, corners, k_max=96, chunk_tiles=32)
assert np.array_equal(np.asarray(r_c.hit_leaf), h_ref), "chunk-size changed hits!"
print("# hits identical across chunk sizes", flush=True)

best_ct = int(os.environ.get("R5_CT", "64"))
for du in (4, 8, 12):
    timeit(f"walk ct={best_ct} du={du}", walk(best_ct, du))

# loads/skips via module globals (clear jit caches so the trace re-reads)
for loads, skips, win in ((2, 3, 4), (4, 3, 4), (4, 4, 8), (6, 3, 8)):
    tile_mod.TILE_LOADS, tile_mod.TILE_SKIPS, tile_mod.TILE_WIN = loads, skips, win
    jax.clear_caches()
    timeit(f"walk ct={best_ct} du=6 L={loads} S={skips} W={win}",
           walk(best_ct, 6))
tile_mod.TILE_LOADS, tile_mod.TILE_SKIPS, tile_mod.TILE_WIN = 2, 3, 4
