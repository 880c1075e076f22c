import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
print(jax.devices(), file=sys.stderr)
for mb in (1, 16, 64):
    n = mb * 1024 * 1024 // 4
    x_h = np.random.rand(n).astype(np.float32)
    t0 = time.time(); x_d = jax.device_put(x_h); x_d.block_until_ready()
    up = time.time() - t0
    t0 = time.time(); _ = np.asarray(x_d); down = time.time() - t0
    print(f"{mb:3d} MB: up {mb/up:7.1f} MB/s   down {mb/down:7.1f} MB/s",
          flush=True)
# device-side eval throughput: terrain scene in jax on TPU
from raytracingtest_tpu import get_scene
sc = get_scene("terrain")
n = 8_000_000
key = jax.random.PRNGKey(0)
pts = jax.random.uniform(key, (3, n), jnp.float32)
f = jax.jit(lambda p: sc(p[0], p[1], p[2], xp=jnp))
r = f(pts); float(jnp.sum(r))
t0 = time.time(); r = f(pts); float(jnp.sum(r)); dt = time.time() - t0
print(f"terrain eval on TPU: {n/dt/1e6:.0f} Mpts/s", flush=True)
