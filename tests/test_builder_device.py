"""Device-side builder (ops/octree_device.py): bit-identical structure to
the host builder, attributes equal to transcendental-op tolerance (XLA vs
numpy sin/sqrt ULPs)."""

import numpy as np
import pytest

import raytracingtest_tpu as rt
from raytracingtest_tpu.ops.octree_device import build_svo_device


@pytest.mark.parametrize("scene,depth", [
    ("sphere", 5), ("terrain", 6), ("flat_ground", 5), ("sphere", 3),
])
def test_device_build_matches_host(scene, depth):
    h = rt.build_svo(rt.get_scene(scene), depth).svo
    d = build_svo_device(rt.get_scene(scene), depth)
    assert h.level_start == d.level_start
    for f in ("masks", "child_base", "leaf_base", "parent_ptr"):
        np.testing.assert_array_equal(np.asarray(getattr(h, f)),
                                      np.asarray(getattr(d, f)), err_msg=f)
    np.testing.assert_allclose(np.asarray(h.leaf_albedo),
                               np.asarray(d.leaf_albedo), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.leaf_normal),
                               np.asarray(d.leaf_normal), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(h.leaf_density),
                                  np.asarray(d.leaf_density))


def test_device_build_chunked_expansion_matches():
    """Force the chunked expansion path (tiny CHUNK_PARENTS) — layout must
    stay parent-major and bit-identical."""
    from raytracingtest_tpu.ops import octree_device as od
    old = od.CHUNK_PARENTS
    od.CHUNK_PARENTS = 512
    try:
        h = rt.build_svo(rt.get_scene("terrain"), 6).svo
        d = build_svo_device(rt.get_scene("terrain"), 6)
        assert h.level_start == d.level_start
        for f in ("masks", "child_base", "leaf_base"):
            np.testing.assert_array_equal(np.asarray(getattr(h, f)),
                                          np.asarray(getattr(d, f)),
                                          err_msg=f)
    finally:
        od.CHUNK_PARENTS = old


def test_device_build_renders_identically():
    """End to end: a device-built SVO renders the same image as the
    host-built one (same structure; attribute ULPs wash out at 8-bit)."""
    import jax.numpy as jnp
    from raytracingtest_tpu.ops import traverse
    from raytracingtest_tpu.ops.camera import Camera
    h = rt.build_svo(rt.get_scene("sphere"), 5).svo.device()
    d = build_svo_device(rt.get_scene("sphere"), 5)
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=64, height=64)
    o, dd = cam.rays(np)
    r0 = traverse.trace_jax(h, jnp.asarray(o), jnp.asarray(dd))
    r1 = traverse.trace_jax(d, jnp.asarray(o), jnp.asarray(dd))
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))
    np.testing.assert_array_equal(np.asarray(r0.hit_t), np.asarray(r1.hit_t))


def test_device_build_rejects_bad_depth():
    with pytest.raises(ValueError):
        build_svo_device(rt.get_scene("sphere"), 0)


def test_split_build_matches_monolithic():
    """build_svo_device_split merges per-octant subtree builds into exactly
    the monolithic structure+attributes (dyadic octant corners make every
    sample position bit-identical)."""
    from raytracingtest_tpu.ops.octree_device import (
        build_svo_device, build_svo_device_split)
    import raytracingtest_tpu as rt
    for scene, depth, split in (("sphere", 5, 1), ("terrain", 6, 2)):
        mono = build_svo_device(rt.get_scene(scene), depth)
        sp = build_svo_device_split(rt.get_scene(scene), depth,
                                    split_level=split)
        assert sp.level_start == mono.level_start
        np.testing.assert_array_equal(np.asarray(mono.masks),
                                      np.asarray(sp.masks))
        np.testing.assert_array_equal(np.asarray(mono.child_base),
                                      np.asarray(sp.child_base))
        np.testing.assert_array_equal(np.asarray(mono.leaf_base),
                                      np.asarray(sp.leaf_base))
        np.testing.assert_array_equal(np.asarray(mono.leaf_albedo),
                                      np.asarray(sp.leaf_albedo))
        np.testing.assert_array_equal(np.asarray(mono.leaf_normal),
                                      np.asarray(sp.leaf_normal))
        np.testing.assert_array_equal(np.asarray(mono.parent_ptr),
                                      np.asarray(sp.parent_ptr))
