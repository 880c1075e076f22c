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

# persistent XLA compilation cache: remote compiles on this backend cost
# 10s-of-seconds per shape; caching them makes repeated bench runs warm
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    # multi-host entry (BASELINE config 5): a no-op on a single host; with
    # RAYT_MULTIHOST=auto or JAX_COORDINATOR_ADDRESS set, each process
    # joins the jax.distributed job and benches process-local ray rows
    from raytracingtest_tpu.parallel import multihost
    mh = multihost.init_from_env()

    # fail fast if the TPU tunnel is held by another process (the axon
    # backend registers at interpreter startup; a late failure would waste
    # the whole host-side build)
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    if mh["process_count"] > 1:
        return _main_multihost(mh)

    from raytracingtest_tpu import build_svo, get_scene
    from raytracingtest_tpu import diff
    from raytracingtest_tpu.ops.camera import Camera

    depth = int(os.environ.get("BENCH_DEPTH", "10"))
    res_px = int(os.environ.get("BENCH_RES", "1024"))
    scene = os.environ.get("BENCH_SCENE", "terrain")
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    mode = os.environ.get("BENCH_MODE", "fwdbwd")
    # tile  = the production tile-amortized traversal (ops/tile.py)
    # brick = the per-ray gather-light brick traversal (ops/brick.py)
    # plain = the reference XLA ESVO loop (ops/traverse.py)
    path = os.environ.get("BENCH_PATH", "tile")

    from raytracingtest_tpu.io import checkpoint as _ckpt
    from raytracingtest_tpu.ops import brick as brick_mod
    from raytracingtest_tpu.ops import tile as tile_mod

    cache = f"/tmp/bench_svo_{scene}_d{depth}.npz"
    cached = os.path.exists(cache)
    build_mode = os.environ.get("BENCH_BUILD", "cache")
    t0 = time.time()
    if build_mode == "device":
        # on-accelerator build (ops/octree_device.py): the honest
        # steady-state build number (first call pays one-time remote
        # compiles on this backend)
        from raytracingtest_tpu.ops.octree_device import build_svo_device
        svo_dev = build_svo_device(get_scene(scene), depth)
        jax.block_until_ready(svo_dev.masks)
        build_s = time.time() - t0
        svo_host = jax.tree_util.tree_map(np.asarray, svo_dev)
        cached = False
    elif cached:
        svo_host = _ckpt.load_svo(cache)
        build_s = time.time() - t0
    else:
        svo_host = build_svo(get_scene(scene), depth).svo
        _ckpt.save_svo(svo_host, cache)
        build_s = time.time() - t0
    svo = svo_host.device()
    use_brick = path == "brick" and depth >= brick_mod.BRICK_LEVELS + 1
    use_tile = path == "tile" and depth >= brick_mod.BRICK_LEVELS + 1
    if use_brick:
        bsvo = brick_mod.make_brick_svo(svo_host).device()
    if use_tile:
        tsvo = tile_mod.make_tile_svo(svo_host).device()
    print(
        f"# build: depth={depth} scene={scene} nodes={svo.n_nodes} "
        f"leaves={svo.n_leaves} in {build_s:.1f}s"
        f" ({'cache load' if cached else 'full build'})",
        file=sys.stderr,
    )

    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=res_px, height=res_px)
    o, d = cam.rays(np)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    if use_tile:
        o_t, d_t, corners, _grid = tile_mod.tile_rays(cam, np)
        o_t = jnp.asarray(o_t)
        d_t = jnp.asarray(d_t)
        corners = jnp.asarray(corners)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    n_rays = o.shape[0]

    # each run() returns a device scalar that depends on every output; the
    # timing loop issues all iterations and fences once at the end
    # (pipelined sustained throughput — the dispatch+fence round trip on
    # this tunnel is ~25 ms flat and overlaps device compute when several
    # frames are in flight; block_until_ready alone is not a reliable
    # fence on the experimental axon backend)
    if use_tile:
        target_t = jnp.zeros((o.shape[0], 3), jnp.float32)
        tile_k = int(os.environ.get("BENCH_TILE_K", "96"))
        tile_fbt = int(os.environ.get("BENCH_FBT", "96"))
        # sub-tile re-walk budget: the r5 default (16 tiles, 2x2 split)
        # drives the bench config's residual to 0 for ~2.5 ms
        tile_fb2 = int(os.environ.get("BENCH_FB2", "16"))
        # enlarged-K budget: 160 reaches residual 0 on the bench scene and
        # cuts ~1.3 ms vs the API default 256 (scratch/r6_fb.py sweep)
        tile_fbk = int(os.environ.get("BENCH_FBK", "160"))
        if mode == "fwd":
            def run(tag):
                img, residual = diff.render_diff_tile(
                    albedo, normal, density, tsvo, o_t, d_t, corners,
                    light + tag, k_max=tile_k, fb_tiles=tile_fbt,
                    fb_k=tile_fbk, fb2_tiles=tile_fb2)
                return jnp.sum(img) + residual
        else:
            def run(tag):
                (loss, residual), grads = diff.loss_and_grads_tile(
                    albedo, normal, density, tsvo, o_t, d_t, corners,
                    light + tag, target_t, k_max=tile_k,
                    fb_tiles=tile_fbt, fb_k=tile_fbk, fb2_tiles=tile_fb2)
                gsum = sum(jnp.sum(jnp.abs(g))
                           for g in jax.tree_util.tree_leaves(grads))
                return loss + gsum + residual
    elif use_brick:
        if mode == "fwd":
            def run(tag):
                img = diff.render_diff_brick(
                    albedo, normal, density, bsvo.top_masks, bsvo.top_child,
                    bsvo.top_parent, bsvo.bricks, o, d, depth,
                    bsvo.top_depth, light + tag)
                return jnp.sum(img)
        else:
            def run(tag):
                loss, grads = diff.loss_and_grads_brick(
                    albedo, normal, density, bsvo.top_masks, bsvo.top_child,
                    bsvo.top_parent, bsvo.bricks, o, d, depth,
                    bsvo.top_depth, light + tag, target)
                gsum = sum(jnp.sum(jnp.abs(g))
                           for g in jax.tree_util.tree_leaves(grads))
                return loss + gsum
    elif path == "pallas" and mode == "fwd":
        def run(tag):
            img = diff.render_diff_pallas(albedo, normal, density, svo.masks,
                                          svo.child_base, svo.leaf_base, o, d,
                                          depth, light + tag)
            return jnp.sum(img)
    elif path == "pallas":
        def run(tag):
            loss, grads = diff.loss_and_grads_pallas(
                albedo, normal, density, svo.masks, svo.child_base,
                svo.leaf_base, o, d, depth, light + tag, target)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + gsum
    elif mode == "fwd":
        def run(tag):
            img = diff.render_diff(albedo, normal, density, svo.masks,
                                   svo.child_base, svo.leaf_base, o, d,
                                   depth, light + tag)
            return jnp.sum(img)
    else:
        def run(tag):
            loss, grads = diff.loss_and_grads(
                albedo, normal, density, svo.masks, svo.child_base,
                svo.leaf_base, o, d, depth, light + tag, target)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + gsum

    # absorb the remote backend's first-execution handshake on a tiny
    # program before touching the big one (the handshake cost is wildly
    # variable and occasionally pathological on large first programs)
    t0 = time.time()
    small = diff.render_diff(albedo, normal, density, svo.masks,
                             svo.child_base, svo.leaf_base, o[:4096],
                             d[:4096], depth, light)
    float(jnp.sum(small))
    print(f"# session warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    zero = jnp.zeros(3, jnp.float32)
    t0 = time.time()
    float(run(zero))
    print(f"# warmup(compile+run): {time.time() - t0:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)
    # deep warmup: the first few executions of a FRESHLY COMPILED program on
    # this tunnel backend carry a ~150 ms per-run tax (PROFILE.md r4)
    for i in range(4):
        float(run(zero * (i + 1)))

    t0 = time.time()
    # vary an input epsilon so no layer can serve a cached result; issue all
    # iterations, fence once (sustained throughput)
    outs = [run(zero * i) for i in range(iters)]
    acc = sum(float(v) for v in outs)
    dt = (time.time() - t0) / iters
    rays_per_s = n_rays / dt
    print(f"# steady-state: {dt*1e3:.1f} ms/iter at {res_px}x{res_px} "
          f"(pipelined)", file=sys.stderr)

    # forward-only companion number in the same session (bench hygiene:
    # both numbers + fraction of the measured ~300 Mrows/s single-chip
    # gather ceiling, PROFILE.md)
    fwd_rays_per_s = None
    if mode == "fwdbwd" and use_tile:
        def run_fwd(tag):
            img, residual = diff.render_diff_tile(
                albedo, normal, density, tsvo, o_t, d_t, corners,
                light + tag, k_max=tile_k, fb_tiles=tile_fbt,
                fb_k=tile_fbk, fb2_tiles=tile_fb2)
            return jnp.sum(img) + residual
        for i in range(5):
            float(run_fwd(zero * i))
        t0 = time.time()
        outs = [run_fwd(zero * i) for i in range(iters)]
        sum(float(v) for v in outs)
        dt_f = (time.time() - t0) / iters
        fwd_rays_per_s = n_rays / dt_f
        print(f"# steady-state fwd: {dt_f*1e3:.1f} ms/iter", file=sys.stderr)

    out = {
        "metric": f"rays_per_s_{mode}_{res_px}px_depth{depth}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 2.0e9,
        "mrays_per_s": round(rays_per_s / 1e6, 2),
        "frac_gather_ceiling": round(rays_per_s / 300e6, 4),
        "ms_per_frame": round(dt * 1e3, 1),
        "iters": iters,
        "timing": "pipelined",
        "build_seconds": round(build_s, 2),
        "build_source": ("device" if build_mode == "device" else
                         "cache" if cached else "host"),
    }
    if fwd_rays_per_s is not None:
        out["fwd_rays_per_s"] = round(fwd_rays_per_s)
        out["fwd_mrays_per_s"] = round(fwd_rays_per_s / 1e6, 2)
        out["fwd_ms_per_frame"] = round(dt_f * 1e3, 1)
        out["fwdbwd_over_fwd"] = round(fwd_rays_per_s / rays_per_s, 2)
    if use_tile:
        # honesty check: the recorded number must be for EXACT hits — report
        # the unresolved-ray residual of the benchmarked config explicitly
        _img, _res = diff.render_diff_tile(
            albedo, normal, density, tsvo, o_t, d_t, corners, light,
            k_max=tile_k, fb_tiles=tile_fbt, fb_k=tile_fbk,
            fb2_tiles=tile_fb2)
        out["residual_rays"] = int(jnp.sum(_res))
    print(json.dumps(out))


def _main_multihost(mh):
    """Config-5 shape: rays sharded over ALL hosts' devices; each process
    generates only its pixel rows, assembles global arrays, and runs the
    sharded fwd(+bwd) step. Throughput = global rays / step time."""
    import jax
    import jax.numpy as jnp

    from raytracingtest_tpu import build_svo, get_scene, diff  # noqa: F401
    from raytracingtest_tpu.io import checkpoint as _ckpt
    from raytracingtest_tpu.ops.camera import Camera
    from raytracingtest_tpu.parallel import multihost
    from raytracingtest_tpu.parallel.mesh import make_mesh
    from raytracingtest_tpu.parallel.render_sharded import render_sharded

    depth = int(os.environ.get("BENCH_DEPTH", "10"))
    res_px = int(os.environ.get("BENCH_RES", "1024"))
    scene = os.environ.get("BENCH_SCENE", "terrain")
    iters = int(os.environ.get("BENCH_ITERS", "4"))

    cache = f"/tmp/bench_svo_{scene}_d{depth}.npz"
    if os.path.exists(cache):
        svo = _ckpt.load_svo(cache).device()
    else:
        svo = build_svo(get_scene(scene), depth).svo.device()

    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=res_px, height=res_px)
    mesh = make_mesh()
    pr = multihost.process_rows(res_px, res_px)
    o_l, d_l = multihost.local_camera_rays(cam, pr)
    o = multihost.global_ray_array(mesh, pr, o_l)
    d = multihost.global_ray_array(mesh, pr, d_l)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)

    def run(tag):
        img = render_sharded(mesh, jnp.asarray(svo.leaf_albedo),
                             jnp.asarray(svo.leaf_normal),
                             jnp.asarray(svo.leaf_density), svo.masks,
                             svo.child_base, svo.leaf_base, o, d, depth,
                             light + tag)
        # fence on the process-local shards only (no full-image host copy;
        # per-shard float() conversions keep each reduction on its device)
        return sum(float(jnp.sum(s.data)) for s in img.addressable_shards)

    zero = jnp.zeros(3, jnp.float32)
    run(zero)
    t0 = time.time()
    for i in range(iters):
        run(zero * i)
    dt = (time.time() - t0) / iters
    n_rays = res_px * res_px
    if jax.process_index() == 0:
        print(f"# multihost: {mh['process_count']} processes x "
              f"{len(jax.local_devices())} local devices", file=sys.stderr)
        print(json.dumps({
            "metric": f"rays_per_s_fwd_{res_px}px_depth{depth}_multihost",
            "value": n_rays / dt,
            "unit": "rays/s",
            "vs_baseline": n_rays / dt / 2.0e9,
        }))


if __name__ == "__main__":
    main()
