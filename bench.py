"""Benchmark: rays/s/chip forward+backward at 1024^2 on a depth-10 SVO.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.md target of 2e9 rays/s
(forward, 1 v5p chip); this bench measures the strictly harder fwd+bwd
number on whatever single chip is available.

Env knobs: BENCH_DEPTH (default 10), BENCH_RES (default 1024),
BENCH_SCENE (default terrain), BENCH_ITERS (default 8),
BENCH_MODE (fwdbwd|fwd, default fwdbwd).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracingtest_tpu import build_svo, get_scene
    from raytracingtest_tpu import diff
    from raytracingtest_tpu.ops.camera import Camera

    depth = int(os.environ.get("BENCH_DEPTH", "10"))
    res_px = int(os.environ.get("BENCH_RES", "1024"))
    scene = os.environ.get("BENCH_SCENE", "terrain")
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    mode = os.environ.get("BENCH_MODE", "fwdbwd")

    t0 = time.time()
    built = build_svo(get_scene(scene), depth)
    svo = built.svo.device()
    build_s = time.time() - t0
    print(
        f"# build: depth={depth} scene={scene} nodes={svo.n_nodes} "
        f"leaves={svo.n_leaves} in {build_s:.1f}s",
        file=sys.stderr,
    )

    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=res_px, height=res_px)
    o, d = cam.rays(np)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    n_rays = o.shape[0]

    if mode == "fwd":
        def run():
            img = diff.render_diff(albedo, normal, density, svo.masks,
                                   svo.child_base, svo.leaf_base, o, d,
                                   depth, light)
            return img
    else:
        def run():
            loss, grads = diff.loss_and_grads(
                albedo, normal, density, svo.masks, svo.child_base,
                svo.leaf_base, o, d, depth, light, target)
            return loss

    t0 = time.time()
    jax.block_until_ready(run())
    print(f"# warmup(compile+run): {time.time() - t0:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    rays_per_s = n_rays / dt

    print(f"# steady-state: {dt*1e3:.1f} ms/iter at {res_px}x{res_px}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"rays_per_s_{mode}_{res_px}px_depth{depth}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 2.0e9,
    }))


if __name__ == "__main__":
    main()
