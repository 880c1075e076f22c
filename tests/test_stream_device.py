"""Device-resident clipmap (VERDICT round-1 item 6): donated-buffer arena
sync + jitted stitched traversal, walked through camera updates and compared
against both the numpy clipmap twin and a monolithic build."""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene
from raytracingtest_tpu.stream.clipmap import (
    Arena, Clipmap, DeviceArena, trace_clipmap, trace_clipmap_device,
)


def _rays_toward(center, n=256, seed=0, dist=2.0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = (np.asarray(center) + dist * v).astype(np.float32)
    d = -v.astype(np.float32)
    return o, d


def test_device_clipmap_walk_matches_numpy_and_monolithic():
    scene = get_scene("sphere")
    arena = Arena(node_capacity=300000, leaf_capacity=300000)
    # single-LOD radius-4 ring: spans 2.0 around the snap, so it fully
    # covers the unit world at every camera position below (chunk 0.25,
    # depth 4 -> effective voxel size 2^-6 == a monolithic depth-6 build)
    clip = Clipmap(scene, arena, min_chunk_size=0.25, radius=4, lods=1,
                   chunk_depth=4)
    dev = DeviceArena(arena)
    mono = build_svo(scene, 6).svo

    walked = 0
    for step, cam in enumerate([(0.5, 0.5, 0.5), (0.26, 0.5, 0.5),
                                (0.26, 0.26, 0.74), (0.74, 0.74, 0.26)]):
        stats = clip.update(cam)
        n_spans = dev.sync()
        if stats["added"]:
            assert n_spans > 0
        trunk, roots, origins, sizes = clip.master()

        o, d = _rays_toward((0.5, 0.5, 0.5), n=256, seed=step)
        leaf_np, t_np, chunk_np = trace_clipmap(
            trunk, (0, 0, 0), clip.octree.root.size, roots, origins, sizes,
            4, arena, o, d, max_chunks=14)
        leaf_dev, t_dev, chunk_dev, trunc_dev = trace_clipmap_device(
            trunk, (0, 0, 0), clip.octree.root.size, roots, origins, sizes,
            4, dev, o, d, max_chunks=14)
        leaf_dev = np.asarray(leaf_dev)
        t_dev = np.asarray(t_dev)

        # device == numpy twin exactly
        np.testing.assert_array_equal(leaf_np, leaf_dev)
        np.testing.assert_allclose(t_np, np.asarray(t_dev), rtol=1e-6,
                                   atol=1e-6)

        # == monolithic build (same effective voxel grid)
        r_mono = traverse.trace_numpy(mono, o, d)
        hit_mono = r_mono.hit_leaf >= 0
        np.testing.assert_array_equal(hit_mono, leaf_dev >= 0)
        np.testing.assert_allclose(t_dev[hit_mono], r_mono.hit_t[hit_mono],
                                   rtol=1e-4, atol=1e-5)
        # attribute identity through the arena
        alb_mono = np.asarray(mono.leaf_albedo)[r_mono.hit_leaf[hit_mono]]
        alb_dev = arena.leaf_albedo[leaf_dev[hit_mono]]
        np.testing.assert_allclose(alb_dev, alb_mono, atol=1e-6)
        walked += 1

    assert walked >= 3
    # eviction happened at some point during the walk (rings moved)
    assert len(clip.resident) > 0


def test_device_arena_sync_incremental():
    """sync() moves only dirty spans; untouched regions stay valid."""
    scene = get_scene("sphere")
    arena = Arena(node_capacity=100000, leaf_capacity=100000)
    clip = Clipmap(scene, arena, min_chunk_size=0.5, radius=1, lods=1,
                   chunk_depth=3)
    dev = DeviceArena(arena)
    clip.update((0.5, 0.5, 0.5))
    n1 = dev.sync()
    assert n1 > 0
    assert dev.sync() == 0  # idempotent: nothing dirty
    np.testing.assert_array_equal(np.asarray(dev.masks), arena.masks)
    np.testing.assert_array_equal(np.asarray(dev.leaf_base), arena.leaf_base)
    np.testing.assert_allclose(np.asarray(dev.leaf_albedo),
                               arena.leaf_albedo)


def test_brick_arena_walk_matches_plain_device_path():
    """The streamed world on the HOT path: phase-2 brick traversal over the
    BrickArena must produce hits bit-identical to the plain device path
    (same arena leaf ids, same t), across updates with eviction."""
    from raytracingtest_tpu.stream.clipmap import (
        BrickArena, DeviceBrickArena, trace_clipmap_device_brick)
    scene = get_scene("sphere")
    arena = Arena(node_capacity=300000, leaf_capacity=300000)
    barena = BrickArena(top_capacity=100000, brick_capacity=150000)
    clip = Clipmap(scene, arena, min_chunk_size=0.25, radius=4, lods=1,
                   chunk_depth=4, brick_arena=barena)
    dev = DeviceArena(arena)
    devb = DeviceBrickArena(barena)

    for step, cam in enumerate([(0.5, 0.5, 0.5), (0.26, 0.5, 0.5),
                                (0.74, 0.74, 0.26)]):
        clip.update(cam)
        dev.sync()
        nb = devb.sync()
        trunk, roots, origins, sizes = clip.master()
        trunkb, rootsb, originsb, sizesb = clip.master_brick()
        np.testing.assert_array_equal(origins, originsb)

        o, d = _rays_toward((0.5, 0.5, 0.5), n=256, seed=step)
        leaf_dev, t_dev, chunk_dev, _ = trace_clipmap_device(
            trunk, (0, 0, 0), clip.octree.root.size, roots, origins, sizes,
            4, dev, o, d, max_chunks=14)
        leaf_b, t_b, chunk_b, _ = trace_clipmap_device_brick(
            trunkb, (0, 0, 0), clip.octree.root.size, rootsb, originsb,
            sizesb, 4, devb, o, d, max_chunks=14)
        np.testing.assert_array_equal(np.asarray(leaf_dev),
                                      np.asarray(leaf_b))
        np.testing.assert_allclose(np.asarray(t_dev), np.asarray(t_b),
                                   rtol=1e-6, atol=1e-6)
        assert (np.asarray(leaf_b) >= 0).sum() > 50
