import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

def bench(f, reps=4):
    r = f(); float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = f(); float(jnp.sum(r.astype(jnp.float32)))
    return (time.time()-t0)/reps

key = jax.random.PRNGKey(0)
for shape in [(4096, 512), (16384, 384), (256, 512), (4096, 64)]:
    x = jax.random.randint(key, shape, 0, 1 << 30, jnp.int32)
    f = jax.jit(lambda x=x: jnp.sort(x, axis=1))
    print(f"sort {shape}: {bench(f)*1e3:8.1f} ms", flush=True)
x = jax.random.randint(key, (1 << 20,), 0, 1 << 30, jnp.int32)
f = jax.jit(lambda: jnp.argsort(x))
print(f"argsort 1M flat: {bench(f)*1e3:8.1f} ms", flush=True)
f2 = jax.jit(lambda: jnp.sort(x))
print(f"sort 1M flat: {bench(f2)*1e3:8.1f} ms", flush=True)
