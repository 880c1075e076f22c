"""Slice/incremental-construction tests (role of the reference's
SliceTests.cs — but with real assertions instead of a log dump,
Assets/Tests/SliceTests.cs:22-37)."""

import numpy as np
import pytest

from raytracingtest_tpu.ops.morton import morton_decode
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene
from raytracingtest_tpu.stream.slices import extend_svo, occupancy_pyramid
from tests.test_builder import assert_svo_equal


@pytest.mark.parametrize("name", ["sphere", "flat_ground", "terrain"])
def test_pyramid_matches_builder_leaves(name):
    scene = get_scene(name)
    depth = 4
    pyr = occupancy_pyramid(scene, depth)
    assert len(pyr) == depth + 1
    assert pyr[0].shape == (1,)
    # finest-level occupancy must equal the builder's exact leaf set
    res = build_svo(scene, depth)
    occ_idx = np.nonzero(pyr[depth])[0].astype(np.uint32)
    x, y, z = morton_decode(occ_idx, xp=np)
    got = set(zip(x.tolist(), y.tolist(), z.tolist()))
    want = set(map(tuple, res.leaf_coords.tolist()))
    assert got == want


def test_pyramid_downsample_is_or():
    scene = get_scene("sphere")
    pyr = occupancy_pyramid(scene, 4)
    for l in range(4):
        np.testing.assert_array_equal(
            pyr[l], pyr[l + 1].reshape(-1, 8).any(axis=1))
    assert pyr[0][0]  # root occupied for a non-empty scene


@pytest.mark.parametrize("name", ["sphere", "flat_ground", "rotated_cuboid", "terrain"])
@pytest.mark.parametrize("depth", [2, 4])
def test_extend_equals_fresh_build(name, depth):
    """AddSlice parity: depth-k build + one slice == depth-(k+1) build,
    byte-identical."""
    scene = get_scene(name)
    base = build_svo(scene, depth)
    extended = extend_svo(base, scene)
    fresh = build_svo(scene, depth + 1)
    assert_svo_equal(extended.svo, fresh.svo)
    np.testing.assert_array_equal(extended.leaf_coords, fresh.leaf_coords)


def test_extend_chain():
    """Repeated slice appends walk depth 2 -> 5 and stay identical to fresh
    builds (the SliceTesting-scene loop, SliceBasedSVOTester)."""
    scene = get_scene("sphere")
    r = build_svo(scene, 2)
    for depth in range(3, 6):
        r = extend_svo(r, scene)
        fresh = build_svo(scene, depth)
        assert_svo_equal(r.svo, fresh.svo)
